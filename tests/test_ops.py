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

    def test_hue_saturation_pixel_parity(self, rng):
        """Chroma rotation/scale in coefficient space == the same linear map
        applied to the decoded chroma planes."""
        from jpeg_detection_resnet_ssd_tpu.ops import dct_chroma_hue_saturation

        cbcr = rng.normal(0, 30, (4, 4, 128)).astype(np.float32)
        theta, s = 0.4, 1.3
        out = np.asarray(
            dct_chroma_hue_saturation(jnp.asarray(cbcr), theta, s)
        )
        cb_pix = blocks_to_pixels(cbcr[..., :64]) - 128.0
        cr_pix = blocks_to_pixels(cbcr[..., 64:]) - 128.0
        np.testing.assert_allclose(
            blocks_to_pixels(out[..., :64]) - 128.0,
            s * (np.cos(theta) * cb_pix - np.sin(theta) * cr_pix),
            atol=1e-2,
        )
        np.testing.assert_allclose(
            blocks_to_pixels(out[..., 64:]) - 128.0,
            s * (np.sin(theta) * cb_pix + np.cos(theta) * cr_pix),
            atol=1e-2,
        )
        # identity parameters are exact
        ident = np.asarray(
            dct_chroma_hue_saturation(jnp.asarray(cbcr), 0.0, 1.0)
        )
        np.testing.assert_allclose(ident, cbcr, atol=1e-5)
        # batched per-image parameters broadcast over (B, H, W, 128)
        batched = np.tile(cbcr[None], (3, 1, 1, 1))
        out_b = np.asarray(
            dct_chroma_hue_saturation(
                jnp.asarray(batched),
                jnp.asarray([0.0, theta, -theta]),
                jnp.asarray([1.0, s, 2.0]),
            )
        )
        np.testing.assert_allclose(out_b[0], cbcr, atol=1e-5)
        np.testing.assert_allclose(
            out_b[1],
            np.asarray(dct_chroma_hue_saturation(jnp.asarray(cbcr), theta, s)),
            atol=1e-4,
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


class TestDCTDetectionAugment:
    def test_crop_flip_box_rewrite(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops.dct_detect_augment import (
            dct_detection_crop_flip,
        )

        B = 8
        H8 = 44  # 352 px source -> crop to 38 blocks (304 px)
        y = rng.normal(0, 50, (B, H8, H8, 64)).astype(np.float32)
        cbcr = rng.normal(0, 20, (B, H8 // 2, H8 // 2, 128)).astype(np.float32)
        gt = np.zeros((B, 4, 5), np.float32)
        gt[:, 0] = [3, 100, 120, 220, 240]  # central box: survives any crop
        gt[:, 1] = [7, 0, 0, 20, 20]        # corner box: may be cropped out
        mask = np.zeros((B, 4), bool)
        mask[:, :2] = True

        yo, co, g, m = dct_detection_crop_flip(
            jnp.asarray(y), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jax.random.PRNGKey(0), out_y_blocks=38,
        )
        yo, co, g, m = map(np.asarray, (yo, co, g, m))
        assert yo.shape == (B, 38, 38, 64) and co.shape == (B, 19, 19, 128)
        out_px = 304
        for b in range(B):
            assert m[b, 0]  # central box always survives
            r = g[b, 0]
            assert r[0] == 3
            # size preserved when not clipped (crop offsets <= 48 px)
            assert abs((r[3] - r[1]) - 120) < 1e-4
            assert abs((r[4] - r[2]) - 120) < 1e-4
            assert 0 <= r[1] < r[3] <= out_px
            # invalid rows zeroed
            assert not m[b, 2] and (g[b, 2] == 0).all()

    def test_flip_correctness_vs_pixels(self, rng):
        """Flip branch: coefficient flip of the crop == pixel flip; box mirror
        matches (checked via a deterministic all-flip key search)."""
        from jpeg_detection_resnet_ssd_tpu.ops.dct_detect_augment import (
            _crop_flip_one,
        )

        y = rng.normal(0, 50, (40, 40, 64)).astype(np.float32)
        cbcr = rng.normal(0, 20, (20, 20, 128)).astype(np.float32)
        gt = np.array([[5, 16, 32, 96, 80]], np.float32)
        mask = np.array([True])
        yc, cc, g, m = _crop_flip_one(
            jnp.asarray(y), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jnp.int32(1), jnp.int32(1), jnp.asarray(True),
            out_y_blocks=38,
        )
        # crop offset 16 px, then mirror in the 304-px frame:
        # xmin' = 304 - (96-16) = 224, xmax' = 304 - (16-16) = 304 -> clip 303
        g = np.asarray(g)
        np.testing.assert_allclose(g[0], [5, 224, 16, 303, 64], atol=1e-4)
        # coefficient content equals flip of the unflipped crop
        yc_noflip, _, _, _ = _crop_flip_one(
            jnp.asarray(y), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jnp.int32(1), jnp.int32(1), jnp.asarray(False),
            out_y_blocks=38,
        )
        from jpeg_detection_resnet_ssd_tpu.ops import dct_flip_horizontal

        np.testing.assert_allclose(
            np.asarray(yc), np.asarray(dct_flip_horizontal(yc_noflip)),
            atol=1e-5,
        )

    def test_composes_with_encoder(self, rng):
        """Augment -> in-step encode: positives land where the moved GT is."""
        from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
        from jpeg_detection_resnet_ssd_tpu.models import ssd_predictor_sizes
        from jpeg_detection_resnet_ssd_tpu.ops.dct_detect_augment import (
            dct_detection_crop_flip,
        )

        enc = TargetEncoder(
            spec=AnchorSpec(img_height=304, img_width=304),
            predictor_sizes=ssd_predictor_sizes("resnet_custom"),
            n_classes=20,
        )
        B = 2
        y = rng.normal(0, 50, (B, 44, 44, 64)).astype(np.float32)
        cbcr = rng.normal(0, 20, (B, 22, 22, 128)).astype(np.float32)
        gt = np.zeros((B, 4, 5), np.float32)
        gt[:, 0] = [3, 120, 120, 260, 230]
        mask = np.zeros((B, 4), bool)
        mask[:, 0] = True
        yo, co, g, m = dct_detection_crop_flip(
            jnp.asarray(y), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jax.random.PRNGKey(1), out_y_blocks=38,
        )
        targets = np.asarray(enc.encode_fn(g, m))
        assert targets.shape == (B, 8732, 33)
        pos = targets[..., 1:21].max(-1)
        assert (pos.sum(axis=1) >= 1).all()


class TestDCTDownscale:
    def test_pixel_parity_with_avg_pool(self, rng):
        """DCT-domain 2x downscale == pixel-space 2x2 average pooling."""
        from jpeg_detection_resnet_ssd_tpu.ops import dct_downscale_2x

        blocks = decode_plane(rng, size=(64, 64))  # (8, 8, 64)
        small = np.asarray(dct_downscale_2x(jnp.asarray(blocks)))
        assert small.shape == (4, 4, 64)
        pix = blocks_to_pixels(blocks)  # (64, 64)
        pooled = pix.reshape(32, 2, 32, 2).mean(axis=(1, 3))
        np.testing.assert_allclose(
            blocks_to_pixels(small), pooled, atol=1e-2
        )

    def test_batched_and_multichannel(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops import dct_downscale_2x

        x = rng.normal(0, 40, (3, 6, 8, 128)).astype(np.float32)
        out = np.asarray(dct_downscale_2x(jnp.asarray(x)))
        assert out.shape == (3, 3, 4, 128)
        # channel groups are independent: each 64-group equals its own 1-group
        a = np.asarray(dct_downscale_2x(jnp.asarray(x[..., :64])))
        np.testing.assert_allclose(out[..., :64], a, atol=1e-4)


class TestDCTDetectionExpand:
    def _setup(self, rng, B=4, H8=44):
        y = rng.normal(0, 50, (B, H8, H8, 64)).astype(np.float32)
        cbcr = rng.normal(0, 20, (B, H8 // 2, H8 // 2, 128)).astype(np.float32)
        gt = np.zeros((B, 4, 5), np.float32)
        gt[:, 0] = [3, 100, 120, 220, 240]
        mask = np.zeros((B, 4), bool)
        mask[:, 0] = True
        return y, cbcr, gt, mask

    def test_expand_scales_and_shifts_gt(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops import dct_detection_expand

        y, cbcr, gt, mask = self._setup(rng)
        yo, co, g, m = dct_detection_expand(
            jnp.asarray(y), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jax.random.PRNGKey(0), prob=1.0,
        )
        yo, co, g, m = map(np.asarray, (yo, co, g, m))
        assert yo.shape == y.shape and co.shape == cbcr.shape
        assert (m == mask).all()
        for b in range(g.shape[0]):
            r = g[b, 0]
            # halved size, offset is a multiple of 16
            np.testing.assert_allclose(r[3] - r[1], 60, atol=1e-4)
            np.testing.assert_allclose(r[4] - r[2], 60, atol=1e-4)
            assert (r[1] - gt[b, 0, 1] * 0.5) % 16 == pytest.approx(0, abs=1e-3)

    def test_expand_pixel_content(self, rng):
        """The expanded map decodes to the 2x-downscaled image placed on a
        constant background."""
        from jpeg_detection_resnet_ssd_tpu.ops import dct_detection_expand

        blocks = decode_plane(rng, size=(64, 64))[None]  # (1, 8, 8, 64)
        cbcr = np.zeros((1, 4, 4, 128), np.float32)
        gt = np.zeros((1, 1, 5), np.float32)
        mask = np.ones((1, 1), bool)
        yo, _, _, _ = dct_detection_expand(
            jnp.asarray(blocks), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jax.random.PRNGKey(3), prob=1.0,
        )
        out_pix = blocks_to_pixels(np.asarray(yo)[0])
        src_pix = blocks_to_pixels(blocks[0])
        pooled = src_pix.reshape(32, 2, 32, 2).mean(axis=(1, 3))
        # the downscaled image appears somewhere 16px-aligned; background is
        # the constant luma of (123,117,104)
        bg = 0.299 * 123 + 0.587 * 117 + 0.114 * 104
        found = False
        for oy in range(0, 33, 16):
            for ox in range(0, 33, 16):
                if np.allclose(
                    out_pix[oy:oy + 32, ox:ox + 32], pooled, atol=0.05
                ):
                    found = True
                    patch_mask = np.ones_like(out_pix, bool)
                    patch_mask[oy:oy + 32, ox:ox + 32] = False
                    np.testing.assert_allclose(
                        out_pix[patch_mask], bg, atol=0.05
                    )
        assert found

    def test_prob_zero_identity(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops import dct_detection_expand

        y, cbcr, gt, mask = self._setup(rng)
        yo, co, g, m = dct_detection_expand(
            jnp.asarray(y), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jax.random.PRNGKey(0), prob=0.0,
        )
        np.testing.assert_allclose(np.asarray(yo), y)
        np.testing.assert_allclose(np.asarray(g), gt)


class TestDctCropResize:
    def _np_interp(self, src, dst, start, length):
        o = np.arange(dst)
        s = start + (o + 0.5) * (length / dst) - 0.5
        i0 = np.floor(s)
        w1 = s - i0
        W = np.zeros((dst, src))
        for oo in range(dst):
            a = int(i0[oo])
            if 0 <= a < src:
                W[oo, a] = 1 - w1[oo]
            if 0 <= a + 1 < src:
                W[oo, a + 1] = w1[oo]
        return W

    def test_interior_crop_matches_pixel_bilinear(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops import dct_crop_resize

        blocks = rng.normal(0, 50, (6, 6, 64)).astype(np.float32)
        P = blocks_to_pixels(blocks) - 128.0
        y0, x0, ch, cw = 5.3, 7.1, 30.2, 28.9
        out = np.asarray(
            dct_crop_resize(jnp.asarray(blocks), y0, x0, ch, cw, 32, 32)
        )
        Wy = self._np_interp(48, 32, y0, ch)
        Wx = self._np_interp(48, 32, x0, cw)
        np.testing.assert_allclose(
            blocks_to_pixels(out) - 128.0, Wy @ P @ Wx.T, atol=1e-2
        )

    def test_oob_crop_fills_background(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops import dct_crop_resize

        blocks = rng.normal(0, 50, (6, 6, 64)).astype(np.float32)
        P = blocks_to_pixels(blocks) - 128.0
        y0, x0, ch, cw, bg = -10.0, 30.0, 60.0, 40.0, -12.0
        out = np.asarray(
            dct_crop_resize(
                jnp.asarray(blocks), y0, x0, ch, cw, 32, 32, background=bg
            )
        )
        Wy = self._np_interp(48, 32, y0, ch)
        Wx = self._np_interp(48, 32, x0, cw)
        ry, rx = 1 - Wy.sum(1), 1 - Wx.sum(1)
        expect = Wy @ P @ Wx.T + bg * (1 - np.outer(1 - ry, 1 - rx))
        np.testing.assert_allclose(
            blocks_to_pixels(out) - 128.0, expect, atol=1e-2
        )

    def test_identity(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops import dct_crop_resize

        blocks = rng.normal(0, 50, (5, 5, 128)).astype(np.float32)
        out = np.asarray(
            dct_crop_resize(jnp.asarray(blocks), 0.0, 0.0, 40.0, 40.0, 40, 40)
        )
        np.testing.assert_allclose(out, blocks, atol=1e-3)

    def test_inbounds_border_crop_replicates_edge(self, rng):
        """An IN-BOUNDS crop touching the image border resizes with cv2-style
        edge replication (no background bleeding): upscaling a constant image
        stays constant."""
        from jpeg_detection_resnet_ssd_tpu.ops import dct_crop_resize
        from jpeg_detection_resnet_ssd_tpu.ops.block_dct import dct2_8x8

        const = np.full((48, 48), -28.0, np.float32)  # level-shifted 100
        blocks = np.asarray(
            dct2_8x8(jnp.asarray(
                const.reshape(6, 8, 6, 8).transpose(0, 2, 1, 3)
            ))
        )
        out = np.asarray(
            dct_crop_resize(
                jnp.asarray(blocks), 0.0, 0.0, 20.0, 20.0, 32, 32,
                background=50.0,
            )
        )
        np.testing.assert_allclose(
            blocks_to_pixels(out) - 128.0, -28.0, atol=1e-2
        )

    def test_hue_sat_mixed_rank_params(self, rng):
        """Scalar hue + per-image sat must not duplicate the batch."""
        from jpeg_detection_resnet_ssd_tpu.ops import dct_chroma_hue_saturation

        cbcr = rng.normal(0, 20, (3, 4, 4, 128)).astype(np.float32)
        out = np.asarray(
            dct_chroma_hue_saturation(
                jnp.asarray(cbcr), 0.0, jnp.asarray([1.0, 2.0, 3.0])
            )
        )
        assert out.shape == cbcr.shape
        np.testing.assert_allclose(out[0], cbcr[0], atol=1e-5)
        np.testing.assert_allclose(out[1], 2.0 * cbcr[1], atol=1e-4)

    def test_nearest_mode(self, rng):
        """nearest=True selects one-hot source samples (pixel parity with a
        numpy nearest-neighbor gather)."""
        from jpeg_detection_resnet_ssd_tpu.ops import dct_crop_resize

        blocks = rng.normal(0, 50, (6, 6, 64)).astype(np.float32)
        P = blocks_to_pixels(blocks) - 128.0
        y0, x0, ch, cw = 4.0, 6.0, 30.0, 26.0
        out = np.asarray(
            dct_crop_resize(
                jnp.asarray(blocks), y0, x0, ch, cw, 32, 32, nearest=True
            )
        )
        o = np.arange(32)
        sy = np.round(y0 + (o + 0.5) * (ch / 32) - 0.5).astype(int)
        sx = np.round(x0 + (o + 0.5) * (cw / 32) - 0.5).astype(int)
        expect = P[np.clip(sy, 0, 47)][:, np.clip(sx, 0, 47)]
        np.testing.assert_allclose(
            blocks_to_pixels(out) - 128.0, expect, atol=1e-2
        )

    def test_per_group_background(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops import dct_crop_resize

        blocks = np.zeros((4, 4, 128), np.float32)
        out = np.asarray(
            dct_crop_resize(
                jnp.asarray(blocks), -100.0, -100.0, 32.0, 32.0, 32, 32,
                background=jnp.asarray([-5.0, 9.0]),
            )
        )
        # fully out of bounds: each group decodes to its own constant
        cb = blocks_to_pixels(out[..., :64]) - 128.0
        cr = blocks_to_pixels(out[..., 64:]) - 128.0
        np.testing.assert_allclose(cb, -5.0, atol=1e-3)
        np.testing.assert_allclose(cr, 9.0, atol=1e-3)


class TestRandomResizedCrop:
    def test_v3_shapes_boxes_and_scale_diversity(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops import (
            dct_detection_random_resized_crop,
        )

        B, H8 = 12, 44
        y = rng.normal(0, 50, (B, H8, H8, 64)).astype(np.float32)
        cbcr = rng.normal(0, 20, (B, H8 // 2, H8 // 2, 128)).astype(np.float32)
        gt = np.zeros((B, 4, 5), np.float32)
        gt[:, 0] = [3, 120, 130, 240, 250]
        mask = np.zeros((B, 4), bool)
        mask[:, 0] = True
        yo, co, g, m = dct_detection_random_resized_crop(
            jnp.asarray(y), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jax.random.PRNGKey(0),
        )
        yo, co, g, m = map(np.asarray, (yo, co, g, m))
        assert yo.shape == (B, 38, 38, 64) and co.shape == (B, 19, 19, 128)
        widths = []
        for b in range(B):
            if m[b, 0]:
                r = g[b, 0]
                assert 0 <= r[1] < r[3] <= 304 and 0 <= r[2] < r[4] <= 304
                widths.append(r[3] - r[1])
        # continuous rescaling: surviving box widths take diverse values
        # (block-aligned crops would keep the width constant at 120*304/352)
        assert len(widths) >= 4
        assert np.std(widths) > 5.0

    def test_v3_gt_box_tracks_pixel_content(self, rng):
        """The rewritten GT box lands on the same image content: paint a
        bright square at the GT location, augment, and check brightness
        inside the new box exceeds outside."""
        from jpeg_detection_resnet_ssd_tpu.ops import (
            dct_detection_random_resized_crop,
        )
        from jpeg_detection_resnet_ssd_tpu.ops.block_dct import dct2_8x8

        B, H8 = 6, 44
        px = np.full((H8 * 8, H8 * 8), -100.0, np.float32)
        px[130:250, 120:240] = 110.0  # bright box at (x 120-240, y 130-250)
        blocks = np.asarray(
            dct2_8x8(
                jnp.asarray(
                    px.reshape(H8, 8, H8, 8).transpose(0, 2, 1, 3)
                )
            )
        )
        y = np.tile(blocks[None], (B, 1, 1, 1))
        cbcr = np.zeros((B, H8 // 2, H8 // 2, 128), np.float32)
        gt = np.zeros((B, 2, 5), np.float32)
        gt[:, 0] = [5, 120, 130, 240, 250]
        mask = np.zeros((B, 2), bool)
        mask[:, 0] = True
        yo, _, g, m = dct_detection_random_resized_crop(
            jnp.asarray(y), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jax.random.PRNGKey(3),
            expand_prob=0.5,
        )
        yo, g, m = map(np.asarray, (yo, g, m))
        for b in range(B):
            if not m[b, 0]:
                continue
            pix = blocks_to_pixels(yo[b]) - 128.0
            x0, y0, x1, y1 = (int(v) for v in g[b, 0, 1:])
            if x1 - x0 < 16 or y1 - y0 < 16:
                continue
            inner = pix[y0 + 4 : y1 - 4, x0 + 4 : x1 - 4].mean()
            assert inner > 30.0, f"image {b}: inner mean {inner}"


class TestMinIoUCrop:
    def test_min_iou_crop_respects_bound_or_fallback(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops import (
            dct_detection_min_iou_crop_flip,
        )

        B, H8 = 16, 44
        y = rng.normal(0, 50, (B, H8, H8, 64)).astype(np.float32)
        cbcr = rng.normal(0, 20, (B, H8 // 2, H8 // 2, 128)).astype(np.float32)
        gt = np.zeros((B, 4, 5), np.float32)
        gt[:, 0] = [3, 100, 120, 220, 240]
        mask = np.zeros((B, 4), bool)
        mask[:, 0] = True
        yo, co, g, m = dct_detection_min_iou_crop_flip(
            jnp.asarray(y), jnp.asarray(cbcr), jnp.asarray(gt),
            jnp.asarray(mask), jax.random.PRNGKey(0),
            out_y_blocks=38, n_trials=8,
        )
        yo, g, m = np.asarray(yo), np.asarray(g), np.asarray(m)
        assert yo.shape == (B, 38, 38, 64)
        # the central 120x120 box has IoU ~0.15 with any 304-crop; the box
        # center always stays inside, so every image keeps its box
        assert m[:, 0].all()
        for b in range(B):
            r = g[b, 0]
            assert 0 <= r[1] < r[3] <= 304 and 0 <= r[2] < r[4] <= 304

    @pytest.mark.slow
    def test_v2_chain_composes_with_encoder(self, rng):
        from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
        from jpeg_detection_resnet_ssd_tpu.models import ssd_predictor_sizes
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_detection_augment_v2,
        )

        enc = TargetEncoder(
            spec=AnchorSpec(img_height=304, img_width=304),
            predictor_sizes=ssd_predictor_sizes("resnet_custom"),
            n_classes=20,
        )
        B = 4
        y = rng.normal(0, 50, (B, 44, 44, 64)).astype(np.float32)
        cbcr = rng.normal(0, 20, (B, 22, 22, 128)).astype(np.float32)
        gt = np.zeros((B, 4, 5), np.float32)
        gt[:, 0] = [3, 60, 60, 280, 280]  # big box: survives crop + expand
        mask = np.zeros((B, 4), bool)
        mask[:, 0] = True
        aug_fn = make_dct_detection_augment_v2(out_y_blocks=38)
        batch = {"inputs": (jnp.asarray(y), jnp.asarray(cbcr)),
                 "gt": jnp.asarray(gt), "gt_mask": jnp.asarray(mask)}
        out = aug_fn(batch, jax.random.PRNGKey(7))
        y2, c2 = out["inputs"]
        assert y2.shape == (B, 38, 38, 64) and c2.shape == (B, 19, 19, 128)
        targets = np.asarray(enc.encode_fn(out["gt"], out["gt_mask"]))
        pos = targets[..., 1:21].max(-1)
        assert (pos.sum(axis=1) >= 1).all()


class TestPallasBipartiteMatch:
    """`ops.pallas_match` kernel vs the XLA candidate-loop fallback vs the
    NumPy reference-semantics loop."""

    def _numpy_greedy(self, sims):
        w = sims.copy()
        m = w.shape[0]
        out = np.full(m, -1, np.int32)
        for _ in range(m):
            rows_best = w.max(axis=1)
            g = int(rows_best.argmax())
            if rows_best[g] < 0:
                break
            a = int(w[g].argmax())
            out[g] = a
            w[g, :] = -1e30
            w[:, a] = -1e30
        return out

    def _random_sims(self, rng, m=16, n=300, n_valid=None):
        sims = rng.uniform(0, 1, (m, n)).astype(np.float32)
        n_valid = m if n_valid is None else n_valid
        sims[n_valid:] = -1e9
        return sims

    def test_xla_and_interpret_match_numpy(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops.pallas_match import (
            bipartite_match,
        )

        for trial in range(5):
            sims = self._random_sims(
                np.random.default_rng(trial), n_valid=trial + 2
            )
            want = self._numpy_greedy(sims)
            got_xla = np.asarray(bipartite_match(jnp.asarray(sims),
                                                 impl="xla"))
            got_pal = np.asarray(bipartite_match(jnp.asarray(sims),
                                                 impl="interpret"))
            np.testing.assert_array_equal(got_xla, want)
            np.testing.assert_array_equal(got_pal, want)

    def test_tie_breaking_first_index(self):
        from jpeg_detection_resnet_ssd_tpu.ops.pallas_match import (
            bipartite_match,
        )

        sims = np.zeros((3, 10), np.float32)
        sims[:] = 0.1
        sims[0, [2, 5]] = 0.9  # row 0 ties at cols 2 and 5 -> picks 2
        sims[1, [2, 7]] = 0.9  # row 1 then picks 7 (2 consumed)
        for impl in ("xla", "interpret"):
            got = np.asarray(bipartite_match(jnp.asarray(sims), impl=impl))
            assert got[0] == 2 and got[1] == 7

    def test_vmapped(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops.pallas_match import (
            bipartite_match,
        )
        import functools

        sims = np.stack([self._random_sims(np.random.default_rng(i),
                                           n_valid=4) for i in range(4)])
        want = np.stack([self._numpy_greedy(s) for s in sims])
        for impl in ("xla", "interpret"):
            f = jax.vmap(functools.partial(bipartite_match, impl=impl))
            np.testing.assert_array_equal(np.asarray(f(jnp.asarray(sims))),
                                          want)

    def test_encoder_impl_parity(self, rng):
        """TargetEncoder outputs are identical across bipartite impls."""
        from jpeg_detection_resnet_ssd_tpu.boxes import (
            AnchorSpec,
            TargetEncoder,
        )

        gt = np.zeros((2, 8, 5), np.float32)
        gt[0, 0] = [3, 30, 40, 180, 190]
        gt[0, 1] = [7, 150, 60, 280, 240]
        gt[1, 0] = [1, 10, 10, 120, 260]
        mask = np.zeros((2, 8), bool)
        mask[0, :2] = True
        mask[1, :1] = True
        sizes = ((38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1))
        outs = []
        for impl in ("xla", "interpret"):
            enc = TargetEncoder(
                spec=AnchorSpec(), predictor_sizes=sizes, n_classes=20,
                bipartite_impl=impl,
            )
            outs.append(np.asarray(enc(gt, mask)))
        np.testing.assert_array_equal(outs[0], outs[1])


class TestInterpModes:
    """The 3 round-3 interpolation modes (cubic/area/lanczos4) complete the
    reference's `ResizeRandomInterp` pool; each mode's full-frame DCT-domain
    resample must match cv2.resize on the decoded float pixels."""

    def _pixels(self, rng, hb=6, wb=6):
        blocks = rng.normal(0, 50, (hb, wb, 64)).astype(np.float32)
        return blocks, (blocks_to_pixels(blocks) - 128.0).astype(np.float32)

    def _run(self, blocks, mode, out=32):
        from jpeg_detection_resnet_ssd_tpu.ops import dct_crop_resize

        H = blocks.shape[0] * 8
        o = np.asarray(dct_crop_resize(
            jnp.asarray(blocks), 0.0, 0.0, float(H), float(H), out, out,
            interp_mode=mode,
        ))
        return blocks_to_pixels(o) - 128.0

    def test_cubic_matches_cv2(self, rng):
        import cv2

        from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import INTERP_CUBIC

        blocks, P = self._pixels(rng)
        got = self._run(blocks, INTERP_CUBIC, out=32)
        want = cv2.resize(P, (32, 32), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(got, want, atol=5e-2)

    def test_cubic_upscale_matches_cv2(self, rng):
        """Upscales push the sample coordinate past the borders (s < 0 at
        the first output row): cv2 keeps the fractional coordinate there and
        clips only the tap indices — clipping s itself collapses the cubic
        kernel onto the edge pixel (observed max border error ~24 intensity
        units before the fix)."""
        import cv2

        from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import INTERP_CUBIC

        blocks, P = self._pixels(rng, hb=3, wb=3)  # 24 px source
        got = self._run(blocks, INTERP_CUBIC, out=64)  # 24 -> 64 upscale
        want = cv2.resize(P, (64, 64), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(got, want, atol=5e-2)

    def test_lanczos_upscale_matches_cv2(self, rng):
        """Same border semantics for the 8-tap lanczos kernel."""
        import cv2

        from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import (
            INTERP_LANCZOS4,
        )

        blocks, P = self._pixels(rng, hb=3, wb=3)
        got = self._run(blocks, INTERP_LANCZOS4, out=64)
        want = cv2.resize(P, (64, 64), interpolation=cv2.INTER_LANCZOS4)
        np.testing.assert_allclose(got, want, atol=0.5)

    def test_area_matches_cv2(self, rng):
        import cv2

        from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import INTERP_AREA

        blocks, P = self._pixels(rng)
        got = self._run(blocks, INTERP_AREA, out=32)  # 48 -> 32 downscale
        want = cv2.resize(P, (32, 32), interpolation=cv2.INTER_AREA)
        np.testing.assert_allclose(got, want, atol=5e-2)

    def test_area_upscale_matches_cv2(self, rng):
        """cv2.INTER_AREA's upscale path is the same generic
        fractional-overlap resample (NOT a bilinear fallback — that applies
        only to its integer-decimation fast path); the augment chain
        upscales most crops, so this direction must hold too."""
        import cv2

        from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import INTERP_AREA

        blocks, P = self._pixels(rng, hb=3, wb=3)  # 24 px source
        got = self._run(blocks, INTERP_AREA, out=64)  # 24 -> 64 upscale
        want = cv2.resize(P, (64, 64), interpolation=cv2.INTER_AREA)
        np.testing.assert_allclose(got, want, atol=5e-2)

    def test_lanczos_matches_cv2(self, rng):
        import cv2

        from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import (
            INTERP_LANCZOS4,
        )

        blocks, P = self._pixels(rng)
        got = self._run(blocks, INTERP_LANCZOS4, out=32)
        want = cv2.resize(P, (32, 32), interpolation=cv2.INTER_LANCZOS4)
        # cv2's float lanczos tables are unnormalized; ours are row-
        # normalized (like cv2's fixed-point tables), so allow a slightly
        # looser tolerance than the polynomial kernels
        np.testing.assert_allclose(got, want, atol=0.5)

    def test_mode_is_traced(self, rng):
        """One compiled program serves every mode (mode is a traced int)."""
        from jpeg_detection_resnet_ssd_tpu.ops import dct_crop_resize
        from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import (
            INTERP_BILINEAR,
            INTERP_NEAREST,
        )

        blocks, _ = self._pixels(rng)

        calls = []

        @jax.jit
        def run(mode):
            calls.append(1)
            return dct_crop_resize(
                jnp.asarray(blocks), 0.0, 0.0, 48.0, 48.0, 32, 32,
                interp_mode=mode,
            )

        a = np.asarray(run(jnp.int32(INTERP_BILINEAR)))
        b = np.asarray(run(jnp.int32(INTERP_NEAREST)))
        assert len(calls) == 1  # single trace
        assert not np.allclose(a, b)

    def test_v3_augment_runs_with_mode_diversity(self, rng):
        """The v3 detection chain samples all 5 modes without retracing."""
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_detection_augment_v3,
        )

        aug = make_dct_detection_augment_v3(out_y_blocks=16)
        B = 8
        batch = {
            "inputs": (
                jnp.asarray(rng.normal(0, 60, (B, 22, 22, 64)), jnp.float32),
                jnp.asarray(rng.normal(0, 20, (B, 11, 11, 128)),
                            jnp.float32),
            ),
            "gt": jnp.asarray(
                np.tile([[3, 20, 20, 120, 120]], (B, 4, 1)), jnp.float32
            ),
            "gt_mask": jnp.asarray(np.tile([True, False, False, False],
                                           (B, 1))),
        }
        out = aug(batch, jax.random.PRNGKey(0))
        y, c = out["inputs"]
        assert np.asarray(y).shape == (B, 16, 16, 64)
        assert np.isfinite(np.asarray(y)).all()
        assert np.isfinite(np.asarray(c)).all()
