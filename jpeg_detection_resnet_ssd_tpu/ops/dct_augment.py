"""DCT-coefficient-domain augmentation: flip and crop WITHOUT re-encoding.

The reference augments in pixel space and pays an RGB -> JPEG -> Huffman-decode
round trip per image per step (`generators.py:180-183`,
`_dct_j2d.py:1167-1189`) — the throughput ceiling of its training stack
(SURVEY.md §3.1), and a lossy recompression besides.  These ops work directly
on `(H8, W8, 64)` coefficient tensors on device:

  * horizontal flip: reverse the block columns AND negate every
    odd-column-frequency coefficient — cos((2(7-x)+1) v pi/16) =
    (-1)^v cos((2x+1) v pi/16), so F'(u, v) = (-1)^v F(u, 7-w_block)(u, v);
  * vertical flip: symmetric in u;
  * crop: 8-pixel-aligned block slicing (for 4:2:0 chroma: 16-pixel-aligned).

Exactness: flip/crop here are BIT-EXACT pixel-domain flips/crops of the
JPEG-decoded image (no recompression loss), verified in tests via the block
IDCT.  Training-distribution parity with the reference's re-encode loop is a
metric-level argument (SURVEY.md §7.4).

A Pallas kernel (`dct_flip_horizontal(..., use_pallas=True)`) implements the
fused reverse+sign-flip for the hot path; the jnp path compiles to the same
fused XLA op and is the default (XLA already fuses a reverse + multiply into
one memory-bound pass — the kernel exists to pin the layout and as the
template for future DCT-domain ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# (-1)^v pattern over the 64 natural-order coefficients, varying along columns
_COL_SIGNS = np.where(np.arange(64) % 8 % 2 == 0, 1.0, -1.0).astype(np.float32)
# (-1)^u pattern, varying along rows of the 8x8 block
_ROW_SIGNS = np.where((np.arange(64) // 8) % 2 == 0, 1.0, -1.0).astype(
    np.float32
)


def _signs_for(channels: int, signs: np.ndarray) -> np.ndarray:
    """Tile the per-block sign pattern to stacked-component channels
    (e.g. CbCr tensors carry Cb|Cr as 128 channels)."""
    if channels % 64 != 0:
        raise ValueError(f"channel count {channels} is not a multiple of 64")
    return np.tile(signs, channels // 64)


def _flip_h_jnp(blocks):
    signs = _signs_for(blocks.shape[-1], _COL_SIGNS)
    return blocks[..., :, ::-1, :] * jnp.asarray(signs, blocks.dtype)


def _flip_h_pallas(blocks):
    """Fused reverse-and-sign-flip Pallas kernel.

    Grid: one program per (batch-collapsed) row of blocks; each program
    reverses its row's W8 blocks and applies the per-coefficient sign mask in
    VMEM.  Shapes: (N, W8, 64) after collapsing leading axes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = blocks.shape[:-2]
    w8, c = blocks.shape[-2], blocks.shape[-1]
    flat = blocks.reshape((-1, w8, c))
    signs = jnp.broadcast_to(jnp.asarray(_COL_SIGNS, flat.dtype), (1, c))

    def kernel(x_ref, s_ref, o_ref):
        x = x_ref[0]  # (W8, 64)
        o_ref[0] = x[::-1, :] * s_ref[:]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        grid=(flat.shape[0],),
        in_specs=[
            pl.BlockSpec((1, w8, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w8, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(flat, signs)
    return out.reshape(lead + (w8, c))


def dct_flip_horizontal(blocks: jnp.ndarray, use_pallas: bool = False):
    """Horizontally flip a (..., H8, W8, 64) coefficient tensor, exactly
    matching a pixel-domain horizontal flip of the decoded image."""
    if use_pallas:
        return _flip_h_pallas(jnp.asarray(blocks))
    return _flip_h_jnp(jnp.asarray(blocks))


def dct_flip_vertical(blocks: jnp.ndarray):
    """Vertical flip: reverse block rows, negate odd row frequencies."""
    blocks = jnp.asarray(blocks)
    signs = _signs_for(blocks.shape[-1], _ROW_SIGNS)
    return blocks[..., ::-1, :, :] * jnp.asarray(signs, blocks.dtype)


def dct_crop_blocks(blocks: jnp.ndarray, y0: int, x0: int, h8: int, w8: int):
    """Block-aligned crop: blocks[y0:y0+h8, x0:x0+w8] (8-pixel granularity).

    Use `lax.dynamic_slice` semantics so traced offsets work under jit.
    """
    blocks = jnp.asarray(blocks)
    start = [0] * (blocks.ndim - 3) + [y0, x0, 0]
    sizes = list(blocks.shape[:-3]) + [h8, w8, blocks.shape[-1]]
    return jax.lax.dynamic_slice(blocks, start, sizes)


@functools.partial(jax.jit, static_argnames=("out_y_blocks", "out_cbcr_blocks"))
def dct_random_crop_flip(
    y: jnp.ndarray,
    cbcr: jnp.ndarray,
    rng: jax.Array,
    out_y_blocks: int = 28,
    out_cbcr_blocks: int = 14,
):
    """Batched device-side random crop + random horizontal flip in DCT space.

    The recompression-free replacement for the reference's per-image
    resize/crop/flip + JPEG re-encode path in classification training
    (`generators.py:145-183`): given oversized coefficient maps
    y (B, H8, W8, 64) and cbcr (B, H8/2, W8/2, 128), takes a random
    16-pixel-aligned crop (so luma and 4:2:0 chroma stay block-aligned) and a
    random horizontal flip, batched and jit-compiled.

    Returns (y_out (B, out_y, out_y, 64), cbcr_out (B, out_c, out_c, 128)).
    """
    B, H8, W8, _ = y.shape
    if out_y_blocks != 2 * out_cbcr_blocks:
        raise ValueError("4:2:0 layout requires out_y_blocks = 2*out_cbcr_blocks")
    max_y0 = (H8 - out_y_blocks) // 2  # in chroma-block (16px) units
    max_x0 = (W8 - out_y_blocks) // 2
    k1, k2, k3 = jax.random.split(rng, 3)
    y0c = jax.random.randint(k1, (B,), 0, max_y0 + 1)
    x0c = jax.random.randint(k2, (B,), 0, max_x0 + 1)
    do_flip = jax.random.bernoulli(k3, 0.5, (B,))

    def one(yb, cb, y0, x0, flip):
        yc = dct_crop_blocks(yb, 2 * y0, 2 * x0, out_y_blocks, out_y_blocks)
        cc = dct_crop_blocks(cb, y0, x0, out_cbcr_blocks, out_cbcr_blocks)
        yc = jnp.where(flip, _flip_h_jnp(yc), yc)
        cc = jnp.where(flip, _flip_h_jnp(cc), cc)
        return yc, cc

    return jax.vmap(one)(y, cbcr, y0c, x0c, do_flip)


@functools.lru_cache(maxsize=None)
def _downscale_mats():
    """Constant 8x8 matrices (M0, M1) for exact DCT-domain 2x downscale.

    Derivation: an 8x8 coefficient block B decodes to pixels P = Cᵀ B C
    (C = orthonormal DCT-II).  Average-pooling a 16x16 tile of four blocks
    down to 8x8 is D = A P_tile Aᵀ with A the (8, 16) 2-tap averaging matrix;
    re-encoding gives  C D Cᵀ = Σ_{i,j} (C A_i Cᵀ) B_ij (C A_j Cᵀ)ᵀ  with
    A_i the left/right 8x8 halves of A.  So the whole downscale is four small
    matmuls per output block — batched below as einsums that XLA maps onto
    the MXU.  Level-shift invariant (averaging commutes with the -128 shift),
    so it applies directly to JPEG's shifted coefficients."""
    k = np.arange(8)
    C = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16) / 2.0
    C[0] /= np.sqrt(2.0)  # orthonormal: C @ C.T == I
    A = np.zeros((8, 16))
    A[k, 2 * k] = 0.5
    A[k, 2 * k + 1] = 0.5
    M0 = C @ A[:, :8] @ C.T
    M1 = C @ A[:, 8:] @ C.T
    return (
        np.ascontiguousarray(M0, np.float32),
        np.ascontiguousarray(M1, np.float32),
    )


def dct_downscale_2x(blocks: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x average-pool downscale in coefficient space.

    (..., H8, W8, k*64) -> (..., H8/2, W8/2, k*64): each output block is a
    fixed linear combination of its four source blocks (see
    `_downscale_mats`) — the recompression-free analog of shrinking the
    decoded image by 2 and re-encoding.  Pixel parity with
    pool2x2(idct(blocks)) is exact (tests).  Four einsum contractions total,
    all MXU-shaped."""
    blocks = jnp.asarray(blocks)
    *lead, H8, W8, Ch = blocks.shape
    if H8 % 2 or W8 % 2 or Ch % 64:
        raise ValueError(f"bad shape for 2x downscale: {blocks.shape}")
    g = Ch // 64
    M0, M1 = (jnp.asarray(m, blocks.dtype) for m in _downscale_mats())
    M = (M0, M1)
    x = blocks.reshape(*lead, H8 // 2, 2, W8 // 2, 2, g, 8, 8)
    out = None
    for i in (0, 1):
        for j in (0, 1):
            term = jnp.einsum(
                "au,...uv,bv->...ab",
                M[i],
                x[..., :, i, :, j, :, :, :],
                M[j],
            )
            out = term if out is None else out + term
    return out.reshape(*lead, H8 // 2, W8 // 2, Ch)


def dct_brightness_contrast(
    blocks: jnp.ndarray,
    brightness: jnp.ndarray | float = 0.0,
    contrast: jnp.ndarray | float = 1.0,
    is_luma: bool = True,
):
    """Photometric adjustment directly in coefficient space.

    Pixel-space `p' = a*(p - 128) + 128 + b` (contrast about the mid-level +
    additive brightness) is EXACT in DCT space: JPEG coefficients encode the
    level-shifted signal (p - 128), so every coefficient scales by `a` and the
    DC term additionally absorbs `8*b` (the 2D DCT's DC gain for a constant).
    Chroma planes encode (C - 128) already centered, so brightness leaves them
    untouched (pass is_luma=False, brightness ignored).

    Device-side replacement for the reference's pixel-space RandomBrightness /
    RandomContrast (`object_detection_2d_photometric_ops.py:225-338`) on the
    recompression-free path.  `brightness`/`contrast` may be scalars or
    per-image (B,) arrays for batched augmentation.
    """
    blocks = jnp.asarray(blocks, jnp.float32)
    a = jnp.asarray(contrast, jnp.float32)
    b = jnp.asarray(brightness, jnp.float32)
    while a.ndim < blocks.ndim:
        a = a[..., None]
        b = b[..., None]
    out = blocks * a
    if is_luma:
        c = blocks.shape[-1]
        dc_mask = (jnp.arange(c) % 64) == 0
        out = out + jnp.where(dc_mask, 8.0 * b, 0.0)
    return out


def make_dct_classification_augment_v2(
    out_y_blocks: int = 28,
    scale_range=(0.35, 1.0),
    ar_range=(0.75, 1.333),
    identity_prob: float = 0.2,
    photometric: bool = True,
):
    """Continuous random-resized-crop classification augment, fully on device.

    The scale/aspect diversity of `classification_train_view` (random scaled
    crops of the source image) realized in coefficient space via
    `ops.dct_resize.dct_crop_resize`: per image sample area scale
    U(scale_range) and aspect ratio U(ar_range) of the source frame, crop a
    random position, resize to the fixed output, random hflip (+ DCT
    photometric).  `identity_prob` keeps full-frame views.  Fixes the
    weak-augmentation overfit of the block-aligned v1 (held-out A/B in
    BENCHMARK.md)."""

    def augment(batch, rng):
        from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import (
            dct_crop_resize,
        )

        y, cbcr = batch["inputs"]
        y = y.astype(jnp.float32)
        cbcr = cbcr.astype(jnp.float32)
        B, H8, W8, _ = y.shape
        H, W = jnp.float32(H8 * 8), jnp.float32(W8 * 8)
        out_px = out_y_blocks * 8
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(rng, 7)
        area = jax.random.uniform(
            k1, (B,), minval=scale_range[0], maxval=scale_range[1]
        )
        ar = jnp.exp(
            jax.random.uniform(
                k2, (B,),
                minval=jnp.log(ar_range[0]), maxval=jnp.log(ar_range[1]),
            )
        )
        ch = jnp.minimum(jnp.sqrt(area / ar) * H, H)
        cw = jnp.minimum(jnp.sqrt(area * ar) * W, W)
        ident = jax.random.bernoulli(k3, identity_prob, (B,))
        ch = jnp.where(ident, H, ch)
        cw = jnp.where(ident, W, cw)
        y0 = jax.random.uniform(k4, (B,)) * (H - ch)
        x0 = jax.random.uniform(k5, (B,)) * (W - cw)
        flip = jax.random.bernoulli(k6, 0.5, (B,))

        def one(y_i, c_i, yy0, xx0, hh, ww, fl):
            y_out = dct_crop_resize(y_i, yy0, xx0, hh, ww, out_px, out_px)
            c_out = dct_crop_resize(
                c_i, yy0 / 2.0, xx0 / 2.0, hh / 2.0, ww / 2.0,
                out_px // 2, out_px // 2,
            )
            y_out = jnp.where(fl, _flip_h_jnp(y_out), y_out)
            c_out = jnp.where(fl, _flip_h_jnp(c_out), c_out)
            return y_out, c_out

        y, cbcr = jax.vmap(one)(y, cbcr, y0, x0, ch, cw, flip)
        if photometric:
            y, cbcr = dct_random_photometric(y, cbcr, k7)
        out = dict(batch)
        out["inputs"] = (y, cbcr)
        return out

    return augment


def make_dct_classification_augment(
    out_y_blocks: int = 28,
    photometric: bool = True,
):
    """Trainer `augment_fn` for classification: batched random 16px-aligned
    crop + hflip (+ DCT-domain photometric) compiled into the train step.

    Pairs with an oversized packed corpus (`data.packed.PackedDctDataset.
    create_classification`, e.g. 256px source -> 224px crops): the complete
    device-side replacement for the reference's per-image pixel augment +
    JPEG re-encode loop (`generators.py:145-183`)."""

    def augment(batch, rng):
        y, cbcr = batch["inputs"]
        # accept int16-shipped coefficients (data/packed.py ship_dtype):
        # cast on device, inside the compiled step
        y = y.astype(jnp.float32)
        cbcr = cbcr.astype(jnp.float32)
        k1, k2 = jax.random.split(rng)
        y, cbcr = dct_random_crop_flip(
            y, cbcr, k1,
            out_y_blocks=out_y_blocks, out_cbcr_blocks=out_y_blocks // 2,
        )
        if photometric:
            y, cbcr = dct_random_photometric(y, cbcr, k2)
        out = dict(batch)
        out["inputs"] = (y, cbcr)
        return out

    return augment


def dct_chroma_hue_saturation(cbcr, hue_rad, sat):
    """Hue rotation + saturation scaling directly on stacked (Cb|Cr)
    coefficients.

    Hue shift ~ rotation of the (Cb-128, Cr-128) chroma vector; saturation ~
    scaling its magnitude.  Both are LINEAR pixel-space maps, so they apply
    EXACTLY per dequantized coefficient (which encode the level-shifted
    planes): [cb'; cr'] = s·R(θ)·[cb; cr].  Device-side analog of the
    reference's pixel-space RandomHue (delta ±18 HSV units ≈ ±36°) and
    RandomSaturation (0.5-1.5)
    (`object_detection_2d_photometric_ops.py:110-224`).  `hue_rad`/`sat` may
    be scalars or per-image (B,) arrays."""
    cbcr = jnp.asarray(cbcr, jnp.float32)
    h = jnp.asarray(hue_rad, jnp.float32)
    s = jnp.asarray(sat, jnp.float32)
    # pad each independently: mixing a scalar with a per-image (B,) array is
    # legal and must not duplicate the batch
    while h.ndim < cbcr.ndim:
        h = h[..., None]
    while s.ndim < cbcr.ndim:
        s = s[..., None]
    cb, cr = cbcr[..., :64], cbcr[..., 64:]
    c, sn = jnp.cos(h), jnp.sin(h)
    cb_out = s * (c * cb - sn * cr)
    cr_out = s * (sn * cb + c * cr)
    return jnp.concatenate([cb_out, cr_out], axis=-1)


def dct_random_photometric(y, cbcr, rng, brightness_range=32.0,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5),
                           hue_max_deg=36.0, prob=0.5):
    """Batched random brightness + contrast + saturation + hue, all in DCT
    space with per-image parameters — the coefficient-domain counterpart of
    the reference's SSDPhotometricDistortions
    (`data_augmentation_chain_original_ssd.py:146-206`)."""
    B = y.shape[0]
    k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(rng, 8)
    bright = jax.random.uniform(
        k1, (B,), minval=-brightness_range, maxval=brightness_range
    ) * jax.random.bernoulli(k2, prob, (B,))
    contrast = jnp.where(
        jax.random.bernoulli(k4, prob, (B,)),
        jax.random.uniform(k3, (B,), minval=contrast_range[0],
                           maxval=contrast_range[1]),
        1.0,
    )
    sat = jnp.where(
        jax.random.bernoulli(k6, prob, (B,)),
        jax.random.uniform(k5, (B,), minval=saturation_range[0],
                           maxval=saturation_range[1]),
        1.0,
    )
    hue = jnp.where(
        jax.random.bernoulli(k8, prob, (B,)),
        jax.random.uniform(
            k7, (B,),
            minval=-hue_max_deg * jnp.pi / 180.0,
            maxval=hue_max_deg * jnp.pi / 180.0,
        ),
        0.0,
    )
    y = dct_brightness_contrast(y, bright, contrast, is_luma=True)
    cbcr = dct_brightness_contrast(cbcr, 0.0, contrast, is_luma=False)
    cbcr = dct_chroma_hue_saturation(cbcr, hue, sat)
    return y, cbcr
