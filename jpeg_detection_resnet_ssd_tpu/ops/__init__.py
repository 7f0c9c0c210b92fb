from jpeg_detection_resnet_ssd_tpu.ops.block_dct import (
    dct2_8x8,
    idct2_8x8,
    DCT_BASIS_8,
)
from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
    dct_flip_horizontal,
    dct_flip_vertical,
    dct_crop_blocks,
    dct_downscale_2x,
    dct_random_crop_flip,
    dct_brightness_contrast,
    dct_chroma_hue_saturation,
    dct_random_photometric,
    make_dct_classification_augment,
    make_dct_classification_augment_v2,
)
from jpeg_detection_resnet_ssd_tpu.ops.dct_detect_augment import (
    dct_detection_crop_flip,
    dct_detection_expand,
    dct_detection_min_iou_crop_flip,
    dct_detection_random_resized_crop,
    make_dct_detection_augment,
    make_dct_detection_augment_v2,
    make_dct_detection_augment_v3,
)
from jpeg_detection_resnet_ssd_tpu.ops.jpeg_quant import (
    jpeg_requantize,
    quant_tables,
)
from jpeg_detection_resnet_ssd_tpu.ops.pixel_photometric import (
    dct_pixel_photometric,
    dct_pixel_photometric_apply,
)
from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import (
    dct_crop_resize,
    dct_resample,
    interp_matrix,
)
from jpeg_detection_resnet_ssd_tpu.ops.pallas_nms import pallas_batched_nms_mask
