"""JPEG requantization op: table parity vs PIL and grid semantics.

The host pipeline's per-view re-encode (`data/dct_convert.py:rgb_to_dct_tensors`,
PIL quality 75) leaves every training coefficient on the quality-75
quantization grid; `ops/jpeg_quant.jpeg_requantize` reproduces that property
for the device chains.  Reference behavior being matched:
`object_detection_2d_data_generator_dct_j2d.py:1167-1189` (re-encode + decode
per augmented view).
"""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_detection_resnet_ssd_tpu.ops.jpeg_quant import (
    jpeg_requantize,
    quant_tables,
    quality_scaling,
)


def _pil_tables(quality):
    """The quantization tables PIL/libjpeg actually embeds at `quality`.
    Pillow (>= 8.3) returns `Image.quantization` already de-zigzagged to
    natural order — the order `quant_tables` uses."""
    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        buf, "jpeg", quality=quality, subsampling=2
    )
    buf.seek(0)
    q = Image.open(buf).quantization
    return (np.asarray(q[0], np.int32), np.asarray(q[1], np.int32))


@pytest.mark.parametrize("quality", [50, 75, 90, 95])
def test_tables_match_pil(quality):
    luma, chroma = quant_tables(quality)
    pil_luma, pil_chroma = _pil_tables(quality)
    np.testing.assert_array_equal(luma, pil_luma)
    np.testing.assert_array_equal(chroma, pil_chroma)


def test_quality_scaling_formula():
    assert quality_scaling(50) == 100   # identity scale
    assert quality_scaling(75) == 50
    assert quality_scaling(25) == 200
    assert quality_scaling(100) == 0    # clamps to all-ones tables
    luma100, chroma100 = quant_tables(100)
    assert (luma100 == 1).all() and (chroma100 == 1).all()


def test_requantize_snaps_to_grid_nearest():
    rng = np.random.default_rng(0)
    y = rng.normal(0, 300, (2, 4, 4, 64)).astype(np.float32)
    cbcr = rng.normal(0, 80, (2, 2, 2, 128)).astype(np.float32)
    y_q, c_q = jpeg_requantize(y, cbcr, quality=75)
    y_q, c_q = np.asarray(y_q), np.asarray(c_q)
    qy, qc = quant_tables(75)
    qcc = np.concatenate([qc, qc])
    # on-grid: every output is an integer multiple of its step
    np.testing.assert_allclose(y_q / qy, np.round(y_q / qy), atol=1e-5)
    np.testing.assert_allclose(c_q / qcc, np.round(c_q / qcc), atol=1e-5)
    # nearest: within half a step of the input
    assert (np.abs(y_q - y) <= qy / 2 + 1e-4).all()
    assert (np.abs(c_q - cbcr) <= qcc / 2 + 1e-4).all()
    # already-on-grid inputs are fixed points (what a decoded JPEG ships)
    y2, c2 = jpeg_requantize(y_q, c_q, quality=75)
    np.testing.assert_allclose(np.asarray(y2), y_q, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c2), c_q, atol=1e-4)


def test_v3_chain_requantize_option():
    """The v3 device chain with requantize_quality emits on-grid
    coefficients; without it, continuous ones."""
    import jax

    from jpeg_detection_resnet_ssd_tpu.ops import (
        make_dct_detection_augment_v3,
    )

    rng = np.random.default_rng(1)
    qy, qc = quant_tables(75)
    # start from on-grid coefficients, as the packed pipeline ships
    y = (rng.integers(-20, 20, (2, 44, 44, 64)) * qy).astype(np.float32)
    cbcr = (
        rng.integers(-6, 6, (2, 22, 22, 128))
        * np.concatenate([qc, qc])
    ).astype(np.float32)
    gt = np.zeros((2, 8, 5), np.float32)
    gt[:, 0] = [3, 30, 40, 160, 170]
    mask = np.zeros((2, 8), bool)
    mask[:, 0] = True
    batch = {"inputs": (y, cbcr), "gt": gt, "gt_mask": mask}

    aug_q = make_dct_detection_augment_v3(
        out_y_blocks=38, requantize_quality=75
    )
    out = jax.jit(aug_q)(batch, jax.random.PRNGKey(3))
    y_o, c_o = (np.asarray(t) for t in out["inputs"])
    assert y_o.shape == (2, 38, 38, 64)
    np.testing.assert_allclose(y_o / qy, np.round(y_o / qy), atol=1e-4)
    qcc = np.concatenate([qc, qc])
    np.testing.assert_allclose(c_o / qcc, np.round(c_o / qcc), atol=1e-4)

    # the default chain's resize produces off-grid values (the difference
    # this op exists to remove)
    aug = make_dct_detection_augment_v3(out_y_blocks=38)
    out2 = jax.jit(aug)(batch, jax.random.PRNGKey(3))
    y2 = np.asarray(out2["inputs"][0])
    frac = np.abs(y2 / qy - np.round(y2 / qy))
    assert (frac > 1e-3).mean() > 0.05
