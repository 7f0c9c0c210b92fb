"""Exact pixel-space photometric augmentation ON DEVICE, between DCT codecs.

`ops/dct_augment.py` approximates the reference's HSV hue/saturation ops
with a chroma-plane rotation — quantified in BENCHMARK.md ("the hue
approximation"): on saturated textures the two hue models diverge per-pixel
by 0.76-0.92 of the effect size.  This module removes that approximation:
it reconstructs pixels from the coefficients (8x8 IDCT as batched einsums —
MXU work, see `ops/block_dct.py`), applies the reference photometric chain
with cv2's actual semantics — per-op [0,255] clips, brightness shift,
multiplicative contrast about 127.5, *hexagonal* HSV saturation/hue walk,
and the 50/50 early-vs-late contrast ordering of
`data_augmentation_chain_original_ssd.py:146-206` /
`object_detection_2d_photometric_ops.py:110-224` — then re-encodes
(forward DCT einsums).  Everything is jit-compatible elementwise/einsum
math with per-image parameters.

What still differs from the host path, by design:
  * no JPEG re-quantization (the host re-encode at quality 75 quantizes the
    coefficients of every view; that adds noise, not signal);
  * no uint8 rounding between ops (sub-LSB);
  * the 4:2:0 chroma resample pair: triangle 2x upsample (libjpeg "fancy"
    weights via half-pixel-centre linear resize) then 2x2 box downsample.

Cost: two IDCT + three DCT einsum sets plus ~a dozen fused elementwise
passes over (B, H, W, 3) pixels — O(0.5-1.5 ms) at batch 32 / 304px.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jpeg_detection_resnet_ssd_tpu.ops.block_dct import dct2_8x8, idct2_8x8


# ---------------------------------------------------------------------------
# block <-> plane
# ---------------------------------------------------------------------------

def blocks_to_plane(blocks: jnp.ndarray) -> jnp.ndarray:
    """(B, hb, wb, 64) natural-order coefficients -> (B, hb*8, wb*8) pixel
    plane (level-shifted: add 128 for unsigned pixels)."""
    px = idct2_8x8(blocks)  # (B, hb, wb, 8, 8)
    b, hb, wb = px.shape[:3]
    return px.transpose(0, 1, 3, 2, 4).reshape(b, hb * 8, wb * 8)


def plane_to_blocks(plane: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) level-shifted pixel plane -> (B, H/8, W/8, 64)."""
    b, h, w = plane.shape
    px = plane.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return dct2_8x8(px)


# ---------------------------------------------------------------------------
# colour conversions (JFIF full-range BT.601; cv2 HSV conventions)
# ---------------------------------------------------------------------------

def ycbcr_to_rgb(y, cb, cr):
    """Full-range JFIF YCbCr planes (pixel domain, [0,255]) -> (..., 3) RGB
    (unclipped — callers clip)."""
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_ycbcr(rgb):
    """(..., 3) RGB [0,255] -> (y, cb, cr) full-range JFIF planes."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def rgb_to_hsv(rgb):
    """(..., 3) RGB [0,255] -> (h_deg [0,360), s [0,255], v [0,255]) —
    continuous version of cv2's 8-bit convention (whose H is degrees/2)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    m = jnp.minimum(jnp.minimum(r, g), b)
    c = v - m
    safe_c = jnp.where(c > 0, c, 1.0)
    h6 = jnp.where(
        v == r,
        ((g - b) / safe_c) % 6.0,
        jnp.where(v == g, (b - r) / safe_c + 2.0, (r - g) / safe_c + 4.0),
    )
    h = jnp.where(c > 0, 60.0 * h6, 0.0)
    s = jnp.where(v > 0, 255.0 * c / jnp.where(v > 0, v, 1.0), 0.0)
    return h, s, v


def hsv_to_rgb(h, s, v):
    """Inverse of `rgb_to_hsv` (hexagonal walk), returns (..., 3) RGB."""
    c = v * s / 255.0
    hp = (h % 360.0) / 60.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    i = jnp.floor(hp).astype(jnp.int32) % 6
    z = jnp.zeros_like(c)
    r1 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [c, x, z, z, x], c)
    g1 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [x, c, c, x, z], z)
    b1 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [z, z, x, c, c], x)
    m = v - c
    return jnp.stack([r1 + m, g1 + m, b1 + m], axis=-1)


# ---------------------------------------------------------------------------
# 4:2:0 chroma resample pair
# ---------------------------------------------------------------------------

def upsample2x(plane: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w) -> (B, 2h, 2w) triangle-filter upsample with half-pixel
    centres — the interior weights (3/4, 1/4) match libjpeg's default
    "fancy" h2v2 upsampler; edges clamp."""
    b, h, w = plane.shape
    return jax.image.resize(plane, (b, 2 * h, 2 * w), method="linear")


def downsample2x(plane: jnp.ndarray) -> jnp.ndarray:
    """(B, 2h, 2w) -> (B, h, w) 2x2 box average — libjpeg's default h2v2
    encoder downsample."""
    b, h, w = plane.shape
    return plane.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


# ---------------------------------------------------------------------------
# the photometric chain
# ---------------------------------------------------------------------------

def _per_image(p, ndim):
    p = jnp.asarray(p, jnp.float32)
    while p.ndim < ndim:
        p = p[..., None]
    return p


def dct_pixel_photometric_apply(y, cbcr, bright, contrast, early, sat,
                                hue_delta):
    """Apply the reference photometric chain with EXPLICIT per-image (B,)
    parameters (for tests and the random wrapper below).

    Parameter conventions follow the host ops (`data/augment.py:34-90`):
    `bright` additive in [-32, 32]; `contrast` multiplicative about 127.5;
    `early` bool — contrast before (True) or after (False) the HSV ops;
    `sat` multiplicative on S; `hue_delta` in cv2 8-bit hue units
    (degrees/2, wraps at 180) — the chain samples U(-18, 18).
    """
    y_plane = blocks_to_plane(jnp.asarray(y, jnp.float32)) + 128.0
    cbcr = jnp.asarray(cbcr, jnp.float32)
    cb = blocks_to_plane(cbcr[..., :64]) + 128.0
    cr = blocks_to_plane(cbcr[..., 64:]) + 128.0
    rgb = ycbcr_to_rgb(y_plane, upsample2x(cb), upsample2x(cr))
    rgb = jnp.clip(rgb, 0.0, 255.0)

    nd = rgb.ndim
    bright = _per_image(bright, nd)
    contrast = _per_image(contrast, nd)
    early = _per_image(early, nd) > 0.5
    sat3 = _per_image(sat, nd - 1)  # h/s/v planes have one dim less
    hue3 = _per_image(hue_delta, nd - 1)
    c_early = jnp.where(early, contrast, 1.0)
    c_late = jnp.where(early, 1.0, contrast)

    rgb = jnp.clip(rgb + bright, 0.0, 255.0)
    rgb = jnp.clip(127.5 + c_early * (rgb - 127.5), 0.0, 255.0)
    h, s, v = rgb_to_hsv(rgb)
    s = jnp.clip(s * sat3, 0.0, 255.0)
    h = (h + 2.0 * hue3) % 360.0
    rgb = jnp.clip(hsv_to_rgb(h, s, v), 0.0, 255.0)
    rgb = jnp.clip(127.5 + c_late * (rgb - 127.5), 0.0, 255.0)

    y_out, cb_out, cr_out = rgb_to_ycbcr(rgb)
    y_blocks = plane_to_blocks(y_out - 128.0)
    cb_blocks = plane_to_blocks(downsample2x(cb_out) - 128.0)
    cr_blocks = plane_to_blocks(downsample2x(cr_out) - 128.0)
    return y_blocks, jnp.concatenate([cb_blocks, cr_blocks], axis=-1)


def dct_pixel_photometric(y, cbcr, rng, brightness_range=32.0,
                          contrast_range=(0.5, 1.5),
                          saturation_range=(0.5, 1.5),
                          hue_max_delta=18.0, prob=0.5):
    """Batched random photometric chain with exact reference semantics.

    Drop-in alternative to `dct_random_photometric` (same (y, cbcr, rng) ->
    (y, cbcr) contract); parameter draws mirror
    `SSDPhotometricDistortions.__call__` (`data/augment.py:98-118`):
    brightness U(-32,32) @ p, contrast U(0.5,1.5) @ p placed early/late
    50/50, saturation U(0.5,1.5) @ p, hue U(-18,18) cv2-units @ p.
    """
    B = y.shape[0]
    keys = jax.random.split(rng, 9)
    bright = jax.random.uniform(
        keys[0], (B,), minval=-brightness_range, maxval=brightness_range
    ) * jax.random.bernoulli(keys[1], prob, (B,))
    contrast = jnp.where(
        jax.random.bernoulli(keys[2], prob, (B,)),
        jax.random.uniform(keys[3], (B,), minval=contrast_range[0],
                           maxval=contrast_range[1]),
        1.0,
    )
    early = jax.random.bernoulli(keys[4], 0.5, (B,))
    sat = jnp.where(
        jax.random.bernoulli(keys[5], prob, (B,)),
        jax.random.uniform(keys[6], (B,), minval=saturation_range[0],
                           maxval=saturation_range[1]),
        1.0,
    )
    hue = jnp.where(
        jax.random.bernoulli(keys[7], prob, (B,)),
        jax.random.uniform(keys[8], (B,), minval=-hue_max_delta,
                           maxval=hue_max_delta),
        0.0,
    )
    return dct_pixel_photometric_apply(y, cbcr, bright, contrast, early,
                                       sat, hue)
