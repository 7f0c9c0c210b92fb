"""RGB array -> JPEG DCT coefficient tensors (the training input transform).

Replicates the reference's data contract exactly: after pixel-space
augmentation, each image is re-encoded to JPEG in RAM and Huffman-decoded to
coefficients (`classification_part/.../generators.py:180-187`,
`localisation_part/.../object_detection_2d_data_generator_dct_j2d.py:1167-1189`).
The recompression is part of the training distribution (SURVEY.md §7.4), so we
keep it byte-identical on the host path; the DCT-domain augmentation ops in
`ops/` offer the faster recompression-free alternative whose parity is argued
at the metric level.
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image

from jpeg_detection_resnet_ssd_tpu import dctjpeg


def rgb_to_dct_tensors(
    image: np.ndarray, quality: int = 75, subsampling: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """(H, W, 3) uint8 RGB -> (dct_y, dct_cbcr) int32 block tensors.

    Default 4:2:0 subsampling matches PIL's default JPEG encoder settings the
    reference uses (`img.save(fake_file, 'jpeg')`): 224x224 -> Y (28,28,64) +
    CbCr (14,14,128); 300x300 -> (38,38,64) + (19,19,128).
    """
    buf = io.BytesIO()
    Image.fromarray(np.asarray(image, np.uint8)).save(
        buf, "jpeg", quality=quality, subsampling=subsampling
    )
    y, cb, cr = dctjpeg.loads(buf.getvalue())
    return y, np.concatenate([cb, cr], axis=-1)


def split_cbcr(cbcr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 128) -> ((h, w, 64), (h, w, 64)) for the deconv architectures
    (`generators.py:197-353` DCTGeneratorJPEG2DCTDeconv)."""
    return cbcr[..., :64], cbcr[..., 64:]


def rgb_to_dct_image(
    image: np.ndarray, crop_hw: tuple[int, int] | None = None, quality: int = 75
) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (H, W, 3) spatial DCT-coefficient image.

    The jpegdecoder path: encode with subsampling=0 (4:4:4, as the reference's
    temp-file writes, `_dct.py:1171`), decode level-2 layout, crop.
    """
    buf = io.BytesIO()
    Image.fromarray(np.asarray(image, np.uint8)).save(
        buf, "jpeg", quality=quality, subsampling=0
    )
    h, w = image.shape[:2]
    crop = crop_hw if crop_hw is not None else (h, w)
    return dctjpeg.decode_dct_image(buf.getvalue(), crop_hw=crop)
