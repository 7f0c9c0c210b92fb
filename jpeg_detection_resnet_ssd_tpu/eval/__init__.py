from jpeg_detection_resnet_ssd_tpu.eval.map_eval import (
    DetectionEvaluator,
    match_predictions,
    average_precision,
    num_gt_per_class,
)
from jpeg_detection_resnet_ssd_tpu.eval.voc_writer import (
    write_voc_detection_files,
    read_voc_detection_files,
)
from jpeg_detection_resnet_ssd_tpu.eval.imagenet_eval import (
    ClassificationEvaluator,
    timed_runs,
)
