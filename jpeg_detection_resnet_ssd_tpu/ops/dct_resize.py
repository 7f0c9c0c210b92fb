"""Continuous crop + resize in DCT coefficient space (the v3 augment core).

The measured gap between the host Caffe-SSD chain and the block-aligned
device chain (BENCHMARK.md "Held-out convergence proxy": mean AP 0.85 vs
0.65) is scale diversity: block-aligned crops of a fixed oversized source
offer two discrete scales, while the reference samples crop scale U(0.3, 1)
on top of expand U(1, 4) (`data_augmentation_chain_original_ssd.py:29-144`).

This module removes the block-alignment restriction entirely.  Bilinear
resize of the DECODED image is a linear map P_out = W_y P W_xᵀ; in block-DCT
space that's

    O[I,J] = Σ_{K,L} (C W_y[I,K] Cᵀ) B[K,L] (C W_x[J,L] Cᵀ)ᵀ

with C the orthonormal 8x8 DCT-II matrix and W[I,K] the (8, 8) sub-blocks of
the interpolation matrix.  W is built PER IMAGE inside jit from four scalars
(crop y0/x0/h/w — traced, continuous, may extend beyond the source), so one
compiled program serves every crop geometry; out-of-bounds source pixels
contribute a constant background via the residual row mass (1 - Σw).  Cost
is two einsum contractions that XLA maps onto the MXU — ~0.2 GFLOP per
image at 44->38 blocks, ~1.5% of the ssd_custom forward pass.

Exactness: equals pixel-domain crop+bilinear-resize of the decoded image to
float precision (tests), with no recompression.
"""

from __future__ import annotations

import jax.numpy as jnp

from jpeg_detection_resnet_ssd_tpu.ops.block_dct import DCT_BASIS_8


def interp_matrix(src_px: int, dst_px: int, start, length, nearest=False,
                  clamp=False):
    """Interpolation matrix W (dst_px, src_px) for resampling the source
    interval [start, start + length) to dst_px output pixels, plus the
    per-output residual mass (dst_px,) assigned to out-of-bounds background.

    Half-pixel-center convention (cv2.INTER_LINEAR): output pixel o samples
    source coordinate start + (o + 0.5) * length / dst_px - 0.5.  `start` and
    `length` are traced scalars (pixels, float); source samples outside
    [0, src_px) contribute zero weight and their mass lands in the residual.
    `nearest` (traced bool) switches to nearest-neighbor weights — the
    interpolation-diversity axis of the reference's `ResizeRandomInterp`
    (`object_detection_2d_geometric_ops.py:102`, 5 random cv2 modes).
    `clamp` (traced bool) clamps sample coordinates to [0, src-1] — cv2's
    border-replicate convention for resizing an in-bounds crop; leave False
    for out-of-source crops, where the residual mass models a background
    canvas (a sample straddling the image edge then blends image and
    background, exactly as a materialized canvas would).
    """
    start = jnp.asarray(start, jnp.float32)
    length = jnp.asarray(length, jnp.float32)
    o = jnp.arange(dst_px, dtype=jnp.float32)
    s = start + (o + 0.5) * (length / dst_px) - 0.5  # (dst,)
    s = jnp.where(
        jnp.asarray(clamp), jnp.clip(s, 0.0, float(src_px - 1)), s
    )
    i0 = jnp.floor(s)
    w1 = s - i0  # weight of i0 + 1
    src = jnp.arange(src_px, dtype=jnp.float32)
    # bilinear: W[o, i] = (1-w1) [i == i0] + w1 [i == i0+1]
    d0 = src[None, :] - i0[:, None]
    W_bl = jnp.where(d0 == 0.0, 1.0 - w1[:, None], 0.0) + jnp.where(
        d0 == 1.0, w1[:, None], 0.0
    )
    # nearest: one-hot at round(s)
    W_nn = jnp.where(src[None, :] - jnp.round(s)[:, None] == 0.0, 1.0, 0.0)
    W = jnp.where(jnp.asarray(nearest), W_nn, W_bl)
    residual = 1.0 - jnp.sum(W, axis=1)
    return W, residual


def _block_mix(W):
    """(dst_px, src_px) pixel matrix -> (D8, K8, 8, 8) block-DCT mixing
    tensor G[I, K] = C @ W[8I:8I+8, 8K:8K+8] @ C.T."""
    C = jnp.asarray(DCT_BASIS_8)
    d8, s8 = W.shape[0] // 8, W.shape[1] // 8
    Wb = W.reshape(d8, 8, s8, 8)
    return jnp.einsum("au,IuKv,bv->IKab", C, Wb, C)


def dct_resample(blocks, Wy, Wx):
    """Apply a pixel-space linear resample to a coefficient tensor.

    blocks: (H8, W8, k*64); Wy: (out_h_px, H8*8); Wx: (out_w_px, W8*8).
    Returns (out_h_px/8, out_w_px/8, k*64).  Exactly equals
    dct(Wy @ idct(blocks) @ Wx.T) per channel group.
    """
    H8, W8, Ch = blocks.shape
    g = Ch // 64
    Gy = _block_mix(Wy)  # (O, K, 8, 8)
    Gx = _block_mix(Wx)  # (P, L, 8, 8)
    B = blocks.reshape(H8, W8, g, 8, 8)
    # T[O, L, g, a, c] = sum_{K, b} Gy[O,K,a,b] B[K,L,g,b,c]
    T = jnp.einsum("OKab,KLgbc->OLgac", Gy, B)
    # out[O, P, g, a, d] = sum_{L, c} T[O,L,g,a,c] Gx[P,L,d,c]
    out = jnp.einsum("OLgac,PLdc->OPgad", T, Gx)
    O, P = out.shape[0], out.shape[1]
    return out.reshape(O, P, g * 64)


def dct_crop_resize(
    blocks,
    y0,
    x0,
    crop_h,
    crop_w,
    out_h_px: int,
    out_w_px: int,
    background=0.0,
    nearest=False,
):
    """Crop [y0, y0+crop_h) x [x0, x0+crop_w) (continuous pixels, may extend
    beyond the source) and resize to (out_h_px, out_w_px), all in coefficient
    space.  `background` is the fill PIXEL value minus 128 (level-shifted),
    a scalar or a per-channel-group (k,) array (e.g. (Cb, Cr) for a stacked
    chroma tensor): out-of-bounds regions decode to that constant.
    `nearest` (traced bool) selects nearest-neighbor resampling.

    blocks: (H8, W8, k*64).  Returns (out_h_px/8, out_w_px/8, k*64).
    """
    H8, W8, Ch = blocks.shape
    g = Ch // 64
    # cv2 parity: a crop fully inside the source (per axis) resizes with
    # border replication; a crop leaving the source blends into the
    # background canvas at the image edge (see interp_matrix docstring)
    y0t = jnp.asarray(y0, jnp.float32)
    x0t = jnp.asarray(x0, jnp.float32)
    clamp_y = (y0t >= 0.0) & (y0t + crop_h <= H8 * 8)
    clamp_x = (x0t >= 0.0) & (x0t + crop_w <= W8 * 8)
    Wy, ry = interp_matrix(H8 * 8, out_h_px, y0, crop_h, nearest=nearest,
                           clamp=clamp_y)
    Wx, rx = interp_matrix(W8 * 8, out_w_px, x0, crop_w, nearest=nearest,
                           clamp=clamp_x)
    out = dct_resample(blocks, Wy, Wx)
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), (g,))

    # residual pixel mass not covered by in-bounds samples gets the
    # background value: mass[o_y, o_x] = 1 - (1-ry)(1-rx).  Only nonzero when
    # the crop leaves the source; computed unconditionally (branch-free).
    from jpeg_detection_resnet_ssd_tpu.ops.block_dct import dct2_8x8

    mass = 1.0 - (1.0 - ry)[:, None] * (1.0 - rx)[None, :]
    rh8, rw8 = out_h_px // 8, out_w_px // 8
    unit = dct2_8x8(
        mass.reshape(rh8, 8, rw8, 8).transpose(0, 2, 1, 3)
    )  # (rh8, rw8, 64)
    out = out.reshape(rh8, rw8, g, 64) + bg[None, None, :, None] * unit[
        :, :, None, :
    ]
    return out.reshape(rh8, rw8, Ch)
