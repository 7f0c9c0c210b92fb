"""Native JPEG->DCT decoder: shape contracts + pixel-reconstruction parity.

Validation strategy (the reference's golden-coefficient test,
`tests_generators.py:66-68`, relies on a cluster-only image): we re-derive the
oracle locally — decode with OUR coefficient decoder, reconstruct pixels via a
NumPy IDCT, and compare against PIL/libjpeg's own full decode of the same
file.  Agreement within ~2 gray levels proves Huffman decode + dequantization
are correct end-to-end.
"""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")
from PIL import Image

from jpeg_detection_resnet_ssd_tpu import dctjpeg


def idct2_block(coef64):
    """Orthonormal 8x8 inverse DCT (JPEG Annex A) of one natural-order block."""
    F = coef64.reshape(8, 8).astype(np.float64)
    x = np.arange(8)
    u = np.arange(8)
    # basis[u, x] = C(u) * cos((2x+1) u pi / 16)
    basis = np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    basis[0, :] *= 1 / np.sqrt(2)
    return 0.25 * basis.T @ F @ basis


def reconstruct_plane(blocks):
    h8, w8, _ = blocks.shape
    out = np.zeros((h8 * 8, w8 * 8))
    for i in range(h8):
        for j in range(w8):
            out[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = idct2_block(
                blocks[i, j]
            )
    return out + 128.0


def make_jpeg(rng, size=(224, 224), quality=75, subsampling=-1, gray=False,
              smooth=False):
    if smooth:
        # Low-frequency content: gradients + a sinusoid; keeps the integer-
        # IDCT-vs-float-IDCT gap small for tight pixel-parity bounds.
        yy, xx = np.mgrid[0 : size[0], 0 : size[1]].astype(np.float64)
        base = 96 + 48 * np.sin(xx / 17.0) + 0.3 * yy
        arr = np.stack([base, base * 0.8 + 20, 255 - base], axis=-1)
        arr = np.clip(arr + rng.normal(0, 2, arr.shape), 0, 255).astype(np.uint8)
    else:
        arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    if gray:
        img = img.convert("L")
    buf = io.BytesIO()
    kw = {"quality": quality}
    if subsampling >= 0:
        kw["subsampling"] = subsampling
    img.save(buf, "jpeg", **kw)
    return buf.getvalue()


class TestShapes:
    def test_224_420_shapes(self, rng):
        buf = make_jpeg(rng, (224, 224), subsampling=2)  # 4:2:0
        y, cb, cr = dctjpeg.loads(buf)
        assert y.shape == (28, 28, 64) and y.dtype == np.int32
        assert cb.shape == (14, 14, 64)
        assert cr.shape == (14, 14, 64)

    def test_300_420_shapes(self, rng):
        buf = make_jpeg(rng, (300, 300), subsampling=2)
        y, cb, cr = dctjpeg.loads(buf)
        assert y.shape == (38, 38, 64)
        assert cb.shape == (19, 19, 64)

    def test_non_multiple_of_8(self, rng):
        buf = make_jpeg(rng, (227, 229), subsampling=2)
        y, cb, cr = dctjpeg.loads(buf)
        assert y.shape == (29, 29, 64)  # ceil(227/8), ceil(229/8)
        assert cb.shape == (15, 15, 64)  # ceil(114/8)=15, ceil(115/8)=15

    def test_grayscale_fallback(self, rng):
        buf = make_jpeg(rng, (64, 64), gray=True)
        y, cb, cr = dctjpeg.loads(buf)
        assert y.shape == (8, 8, 64)
        assert (cb == 0).all() and (cr == 0).all()

    def test_corrupt_raises(self):
        with pytest.raises(dctjpeg.JPEGDecodeError):
            dctjpeg.loads(b"\xff\xd8\xff garbage not a jpeg")


class TestPixelParity:
    @pytest.mark.parametrize("subsampling", [0, 2])
    def test_idct_matches_pil(self, rng, subsampling):
        buf = make_jpeg(rng, (64, 64), quality=90, subsampling=subsampling, smooth=True)
        y, cb, cr = dctjpeg.loads(buf)
        recon_y = np.clip(np.round(reconstruct_plane(y)), 0, 255)
        pil_y = np.asarray(Image.open(io.BytesIO(buf)).convert("YCbCr"))[..., 0]
        err = np.abs(recon_y - pil_y.astype(np.float64))
        assert err.mean() < 1.0 and err.max() <= 4.0, (err.mean(), err.max())

    def test_dc_term_tracks_mean(self, rng):
        """DC coefficient / 8 + 128 ~= block mean brightness."""
        buf = make_jpeg(rng, (64, 64), quality=95, subsampling=2, smooth=True)
        y, _, _ = dctjpeg.loads(buf)
        pil_y = np.asarray(
            Image.open(io.BytesIO(buf)).convert("YCbCr"), dtype=np.float64
        )[..., 0]
        block_means = pil_y.reshape(8, 8, 8, 8).mean(axis=(1, 3))
        dc_means = y[..., 0] / 8.0 + 128.0
        np.testing.assert_allclose(dc_means, block_means, atol=3.0)


class TestDCTImage:
    def test_444_layout(self, rng):
        buf = make_jpeg(rng, (304, 304), subsampling=0)
        img = dctjpeg.decode_dct_image(buf, crop_hw=(300, 300))
        assert img.shape == (300, 300, 3)
        # block (0,0) DC coefficient sits at pixel (0,0) of each plane
        y, cb, cr = dctjpeg.loads(buf)
        assert img[0, 0, 0] == y[0, 0, 0]

    def test_rejects_subsampled(self, rng):
        buf = make_jpeg(rng, (64, 64), subsampling=2)
        with pytest.raises(dctjpeg.JPEGDecodeError):
            dctjpeg.decode_dct_image(buf)

    def test_plane_roundtrip(self, rng):
        blocks = rng.integers(-100, 100, (4, 5, 64)).astype(np.int32)
        plane = dctjpeg.blocks_to_plane(blocks)
        assert plane.shape == (32, 40)
        np.testing.assert_array_equal(dctjpeg.plane_to_blocks(plane), blocks)


class TestGolden:
    """Golden-coefficient oracle on a checked-in JPEG — the role of the
    reference's bit-exactness test (`tests_generators.py:66-68`), but against
    a fixture that ships with the repo instead of a cluster path."""

    def test_golden_coefficients(self):
        import os

        path = os.path.join(os.path.dirname(__file__), "data", "golden.jpg")
        y, cb, cr = dctjpeg.load(path)
        assert y.shape == (28, 28, 64) and cb.shape == (14, 14, 64)
        assert y[0, 0, :6].tolist() == [-144, -30, 0, 0, 0, 0]
        assert y[10, 10, :6].tolist() == [-312, -6, 0, 0, 0, 0]
        assert cb[0, 0, :4].tolist() == [81, 81, 0, 0]
        assert cr[5, 5, :4].tolist() == [-72, -9, 0, 0]
        assert (int(y.sum()), int(cb.sum()), int(cr.sum())) == (
            -21752, 1827, 4149,
        )


class TestProgressive:
    def test_progressive_jpeg_decodes(self, rng):
        """Progressive JPEGs (present in raw ImageNet) decode identically to
        their baseline re-encoding at the coefficient level."""
        arr_buf = make_jpeg(rng, (96, 96), quality=85, subsampling=2,
                            smooth=True)
        img = Image.open(io.BytesIO(arr_buf))
        base = io.BytesIO()
        prog = io.BytesIO()
        img.save(base, "jpeg", quality=90, subsampling=2)
        img.save(prog, "jpeg", quality=90, subsampling=2, progressive=True)
        yb, cbb, crb = dctjpeg.loads(base.getvalue())
        yp, cbp, crp = dctjpeg.loads(prog.getvalue())
        assert yp.shape == yb.shape
        np.testing.assert_array_equal(yp, yb)
        np.testing.assert_array_equal(cbp, cbb)

    def test_restart_markers(self, rng):
        buf0 = make_jpeg(rng, (64, 64), quality=85, smooth=True)
        img = Image.open(io.BytesIO(buf0))
        with_rst = io.BytesIO()
        img.save(with_rst, "jpeg", quality=90, restart_marker_blocks=2)
        y, cb, cr = dctjpeg.loads(with_rst.getvalue())
        assert y.shape == (8, 8, 64)
