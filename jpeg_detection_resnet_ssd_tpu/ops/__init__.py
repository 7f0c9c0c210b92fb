from jpeg_detection_resnet_ssd_tpu.ops.block_dct import (
    dct2_8x8,
    idct2_8x8,
    DCT_BASIS_8,
)
from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
    dct_flip_horizontal,
    dct_flip_vertical,
    dct_crop_blocks,
    dct_random_crop_flip,
    dct_brightness_contrast,
    dct_random_photometric,
)
