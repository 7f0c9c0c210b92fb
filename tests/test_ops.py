"""DCT-domain ops: block DCT round trips + exact flip/crop parity."""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from PIL import Image

from jpeg_detection_resnet_ssd_tpu import dctjpeg
from jpeg_detection_resnet_ssd_tpu.ops import (
    dct2_8x8,
    dct_crop_blocks,
    dct_flip_horizontal,
    dct_flip_vertical,
    dct_random_crop_flip,
    idct2_8x8,
)


def decode_plane(rng, size=(64, 64)):
    arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "jpeg", quality=90)
    y, cb, cr = dctjpeg.loads(buf.getvalue())
    return y.astype(np.float32)


def blocks_to_pixels(blocks):
    """(H8, W8, 64) -> (H, W) via the einsum IDCT + level shift."""
    pix = np.asarray(idct2_8x8(jnp.asarray(blocks))) + 128.0
    h8, w8 = blocks.shape[:2]
    return pix.transpose(0, 2, 1, 3).reshape(h8 * 8, w8 * 8)


class TestBlockDCT:
    def test_roundtrip(self, rng):
        blocks = rng.normal(0, 50, (4, 5, 64)).astype(np.float32)
        pix = idct2_8x8(jnp.asarray(blocks))
        back = dct2_8x8(pix)
        np.testing.assert_allclose(np.asarray(back), blocks, atol=1e-3)

    def test_dc_only_block(self):
        blocks = np.zeros((1, 1, 64), np.float32)
        blocks[0, 0, 0] = 80.0  # DC only -> constant 80/8 = 10
        pix = np.asarray(idct2_8x8(jnp.asarray(blocks)))
        np.testing.assert_allclose(pix, 10.0, atol=1e-5)


class TestDCTFlip:
    def test_hflip_exact_pixel_parity(self, rng):
        blocks = decode_plane(rng)
        flipped = np.asarray(dct_flip_horizontal(jnp.asarray(blocks)))
        np.testing.assert_allclose(
            blocks_to_pixels(flipped),
            blocks_to_pixels(blocks)[:, ::-1],
            atol=1e-2,
        )

    def test_vflip_exact_pixel_parity(self, rng):
        blocks = decode_plane(rng)
        flipped = np.asarray(dct_flip_vertical(jnp.asarray(blocks)))
        np.testing.assert_allclose(
            blocks_to_pixels(flipped),
            blocks_to_pixels(blocks)[::-1, :],
            atol=1e-2,
        )

    def test_pallas_kernel_matches_jnp(self, rng):
        blocks = rng.normal(0, 50, (2, 6, 8, 64)).astype(np.float32)
        ref = np.asarray(dct_flip_horizontal(jnp.asarray(blocks)))
        # interpret mode on CPU (compiled mode requires real TPU)
        from jax.experimental import pallas as pl

        import jpeg_detection_resnet_ssd_tpu.ops.dct_augment as m

        orig = pl.pallas_call

        def patched(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)

        pl.pallas_call = patched
        try:
            out = np.asarray(
                dct_flip_horizontal(jnp.asarray(blocks), use_pallas=True)
            )
        finally:
            pl.pallas_call = orig
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_double_flip_identity(self, rng):
        blocks = rng.normal(0, 50, (3, 4, 64)).astype(np.float32)
        twice = dct_flip_horizontal(dct_flip_horizontal(jnp.asarray(blocks)))
        np.testing.assert_allclose(np.asarray(twice), blocks, atol=1e-5)


class TestDCTCrop:
    def test_crop_pixel_parity(self, rng):
        blocks = decode_plane(rng)
        cropped = np.asarray(dct_crop_blocks(jnp.asarray(blocks), 1, 2, 4, 4))
        np.testing.assert_allclose(
            blocks_to_pixels(cropped),
            blocks_to_pixels(blocks)[8:40, 16:48],
            atol=1e-4,
        )

    def test_random_crop_flip_batched(self, rng):
        B = 4
        y = rng.normal(0, 50, (B, 32, 32, 64)).astype(np.float32)
        cbcr = rng.normal(0, 20, (B, 16, 16, 128)).astype(np.float32)
        yo, co = dct_random_crop_flip(
            jnp.asarray(y), jnp.asarray(cbcr), jax.random.PRNGKey(0)
        )
        assert yo.shape == (B, 28, 28, 64)
        assert co.shape == (B, 14, 14, 128)
        # deterministic under the same key
        yo2, co2 = dct_random_crop_flip(
            jnp.asarray(y), jnp.asarray(cbcr), jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(np.asarray(yo), np.asarray(yo2))


class TestUtils:
    def test_step_timer(self):
        import time as _t

        from jpeg_detection_resnet_ssd_tpu.utils import StepTimer

        t = StepTimer(skip=1)
        for _ in range(4):
            t.tick()
            _t.sleep(0.01)
        assert t.steps_per_sec() > 0

    def test_primary_process(self):
        from jpeg_detection_resnet_ssd_tpu.utils import is_primary_process

        assert is_primary_process() is True


class TestDCTPhotometric:
    def test_brightness_contrast_pixel_parity(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
            dct_brightness_contrast,
        )

        blocks = decode_plane(rng)
        a, b = 1.3, 17.0
        adjusted = np.asarray(
            dct_brightness_contrast(jnp.asarray(blocks), b, a, is_luma=True)
        )
        pix = blocks_to_pixels(blocks)
        expected = a * (pix - 128.0) + 128.0 + b
        np.testing.assert_allclose(
            blocks_to_pixels(adjusted), expected, atol=1e-2
        )

    def test_batched_random_photometric(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
            dct_random_photometric,
        )

        y = rng.normal(0, 50, (4, 8, 8, 64)).astype(np.float32)
        cbcr = rng.normal(0, 20, (4, 4, 4, 128)).astype(np.float32)
        yo, co = dct_random_photometric(
            jnp.asarray(y), jnp.asarray(cbcr), jax.random.PRNGKey(0)
        )
        assert yo.shape == y.shape and co.shape == cbcr.shape
        # deterministic under same key
        yo2, _ = dct_random_photometric(
            jnp.asarray(y), jnp.asarray(cbcr), jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(np.asarray(yo), np.asarray(yo2))
