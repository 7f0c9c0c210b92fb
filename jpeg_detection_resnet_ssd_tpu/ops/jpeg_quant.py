"""JPEG quantization-grid snapping for device-side augmentation chains.

The reference's host pipeline re-encodes every augmented view to JPEG before
Huffman-decoding it back to coefficients
(`localisation_part/data_generator/object_detection_2d_data_generator_dct_j2d.py:1167-1189`,
PIL `img.save(fake_file, 'jpeg')` at quality 75), so every coefficient the
model ever trains on lies on the quality-75 quantization grid:
``coef = level * q[k]`` with ``q`` the libjpeg-scaled Annex K table for that
component.  The DCT-domain device chains (`ops/dct_detect_augment.py`)
transform coefficients linearly and therefore emit CONTINUOUS values — a
distribution difference the multi-seed convergence proxy can see
(BENCHMARK.md "Held-out convergence proxy (round 3)").

`jpeg_requantize` closes exactly that difference on device: snap each
coefficient to the nearest multiple of its quantizer step, per frequency and
per component, using the same tables libjpeg derives for the pipeline's
quality setting.  One fused multiply-round-multiply over the coefficient
tensors — microseconds at batch 32.

Table derivation mirrors libjpeg `jcparam.c:jpeg_quality_scaling` /
`jpeg_add_quant_table` (force_baseline): Annex K base tables scaled by
``5000/q`` (q < 50) or ``200 - 2q`` (q >= 50), rounded with +50/100 and
clamped to [1, 255].  `tests/test_jpeg_quant.py` pins these against the
tables PIL actually embeds in a quality-75 file.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ITU-T T.81 Annex K quantization tables, NATURAL (row-major) order — the
# same order dctjpeg.loads emits coefficients in.
ANNEX_K_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

ANNEX_K_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)


def quality_scaling(quality: int) -> int:
    """libjpeg `jpeg_quality_scaling`: quality 1-100 -> percent scale."""
    quality = int(min(max(quality, 1), 100))
    if quality < 50:
        return 5000 // quality
    return 200 - quality * 2


def quant_tables(quality: int = 75) -> tuple[np.ndarray, np.ndarray]:
    """(luma, chroma) quantizer steps, natural order, for a libjpeg/PIL
    baseline encode at `quality` (force_baseline clamp to [1, 255])."""
    scale = quality_scaling(quality)

    def scale_table(base):
        t = (base * scale + 50) // 100
        return np.clip(t, 1, 255).astype(np.int32)

    return scale_table(ANNEX_K_LUMA), scale_table(ANNEX_K_CHROMA)


def jpeg_requantize(y: jnp.ndarray, cbcr: jnp.ndarray, quality: int = 75):
    """Snap dequantized coefficients to the quality-`quality` JPEG grid.

    y:    (..., 64) luma coefficients (natural order, dequantized);
    cbcr: (..., 128) chroma coefficients (Cb ++ Cr, each natural order).

    Returns (y, cbcr) with every coefficient replaced by the nearest multiple
    of its quantizer step — the coefficient distribution a PIL re-encode at
    the same quality would produce (modulo the encoder's pixel-domain clip,
    which the pixel-photometric leg already applies where it matters).
    """
    qy, qc = quant_tables(quality)
    qy = jnp.asarray(qy, jnp.float32)
    qcc = jnp.concatenate(
        [jnp.asarray(qc, jnp.float32)] * 2, axis=0
    )  # Cb and Cr share the chroma table
    y = jnp.round(y / qy) * qy
    cbcr = jnp.round(cbcr / qcc) * qcc
    return y, cbcr
