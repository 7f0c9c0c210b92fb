"""Box geometry, anchors, target encoding and prediction decoding.

TPU-native (jnp, shape-static, jit-able) re-design of the reference's NumPy
box stack (`localisation_part/bounding_box_utils/`, `ssd_encoder_decoder/`).
"""

from jpeg_detection_resnet_ssd_tpu.boxes.geometry import (
    centroids_to_corners,
    corners_to_centroids,
    corners_to_minmax,
    minmax_to_corners,
    iou_matrix,
    iou_elementwise,
    intersection_area_matrix,
)
from jpeg_detection_resnet_ssd_tpu.boxes.anchors import (
    AnchorSpec,
    SSD300_SCALES_VOC,
    SSD300_ASPECT_RATIOS,
    SSD300_STEPS,
    SSD300_VARIANCES,
    anchor_grid_for_layer,
    build_anchors,
    n_boxes_per_cell,
)
from jpeg_detection_resnet_ssd_tpu.boxes.matching import (
    match_bipartite_greedy,
    match_multi,
)
from jpeg_detection_resnet_ssd_tpu.boxes.target_encoder import (
    TargetEncoder,
    encode_targets,
)
from jpeg_detection_resnet_ssd_tpu.boxes.decode import (
    decode_raw_predictions,
    decode_detections,
    nms_per_class,
)
