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


# Interpolation modes, mirroring the reference's `ResizeRandomInterp`
# pool of 5 random cv2 modes (`object_detection_2d_geometric_ops.py:102`):
INTERP_BILINEAR = 0
INTERP_NEAREST = 1
INTERP_CUBIC = 2    # Catmull-Rom a=-0.75 (cv2.INTER_CUBIC's kernel)
INTERP_AREA = 3     # fractional overlap of the output span with each source
                    # cell — cv2.INTER_AREA's generic path for BOTH
                    # directions (measured: upscale matches cv2 to ~2.5e-5;
                    # cv2's documented "bilinear fallback" applies only to
                    # its integer-decimation fast path, not the resample
                    # semantics)
INTERP_LANCZOS4 = 4  # 8-tap windowed sinc, row-normalized like cv2's tables
N_INTERP_MODES = 5


def _cubic_kernel(x, a=-0.75):
    """cv2.INTER_CUBIC weight function (BiCubic, alpha=-0.75)."""
    ax = jnp.abs(x)
    w1 = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    w2 = ((a * ax - 5.0 * a) * ax + 8.0 * a) * ax - 4.0 * a
    return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def _lanczos_kernel(x, taps=4):
    """Lanczos-a windowed sinc (a=4 for cv2.INTER_LANCZOS4)."""
    pix = jnp.pi * x
    safe = jnp.where(jnp.abs(x) < 1e-7, 1.0, pix)
    sinc = jnp.where(jnp.abs(x) < 1e-7, 1.0, jnp.sin(safe) / safe)
    safe_a = jnp.where(jnp.abs(x) < 1e-7, 1.0, pix / taps)
    sinc_a = jnp.where(
        jnp.abs(x) < 1e-7, 1.0, jnp.sin(safe_a) / safe_a
    )
    return jnp.where(jnp.abs(x) < taps, sinc * sinc_a, 0.0)


def interp_matrix(src_px: int, dst_px: int, start, length, nearest=False,
                  clamp=False, mode=None):
    """Interpolation matrix W (dst_px, src_px) for resampling the source
    interval [start, start + length) to dst_px output pixels, plus the
    per-output residual mass (dst_px,) assigned to out-of-bounds background.

    Half-pixel-center convention (cv2): output pixel o samples source
    coordinate start + (o + 0.5) * length / dst_px - 0.5.  `start` and
    `length` are traced scalars (pixels, float); source samples outside
    [0, src_px) contribute zero weight and their mass lands in the residual
    (for kernels with negative lobes the residual is the exact signed weight
    a materialized background canvas would receive).

    `mode` (traced int32, one of the INTERP_* constants) selects the kernel;
    the legacy `nearest` bool maps to INTERP_NEAREST when `mode` is None.
    `clamp` (traced bool) applies cv2's border-replicate convention for
    resizing an in-bounds crop: out-of-range taps fold their weight onto the
    edge pixels; leave False for out-of-source crops, where the residual
    mass models the background canvas.
    """
    # `mode is None` is a STATIC fact: legacy nearest-bool callers (the v2
    # chains) can only ever select bilinear or nearest, so skip building
    # the cubic/area/lanczos matrices entirely for them — under a traced
    # `mode` XLA cannot DCE the unused kernel branches of the select.
    legacy_two_kernel = mode is None
    if legacy_two_kernel:
        mode = jnp.where(jnp.asarray(nearest), INTERP_NEAREST,
                         INTERP_BILINEAR)
    mode = jnp.asarray(mode, jnp.int32)
    start = jnp.asarray(start, jnp.float32)
    length = jnp.asarray(length, jnp.float32)
    o = jnp.arange(dst_px, dtype=jnp.float32)
    step = length / dst_px
    s_raw = start + (o + 0.5) * step - 0.5  # (dst,)
    clamp_t = jnp.asarray(clamp)
    # cv2 border semantics under clamp differ by kernel: INTER_LINEAR /
    # INTER_NEAREST clip the SAMPLE COORDINATE to [0, src-1] (for 2-tap
    # kernels that is identical to clipping the taps), but INTER_CUBIC /
    # INTER_LANCZOS4 keep the fractional coordinate and clip only the TAP
    # INDICES (border replicate) — clipping s there would zero the fraction
    # at the borders and collapse the kernel onto the edge pixel, diverging
    # from cv2 on the first/last output rows/cols of any in-bounds upscale.
    s_lin = jnp.where(
        clamp_t, jnp.clip(s_raw, 0.0, float(src_px - 1)), s_raw
    )
    src = jnp.arange(src_px, dtype=jnp.float32)
    i0_lin = jnp.floor(s_lin)
    frac_lin = s_lin - i0_lin
    i0_raw = jnp.floor(s_raw)
    frac_raw = s_raw - i0_raw

    def taps_matrix(i0, offsets, weights):
        """Dense W from per-output tap (index, weight) lists; with clamp,
        out-of-range taps fold onto the edge columns (border replicate)."""
        W = jnp.zeros((dst_px, src_px), jnp.float32)
        for off, w in zip(offsets, weights):
            idx = i0 + off  # (dst,)
            idx_eff = jnp.where(
                clamp_t, jnp.clip(idx, 0.0, float(src_px - 1)), idx
            )
            W = W + jnp.where(
                src[None, :] == idx_eff[:, None], w[:, None], 0.0
            )
        return W

    # bilinear: 2 taps
    W_bl = taps_matrix(i0_lin, (0.0, 1.0), (1.0 - frac_lin, frac_lin))
    # nearest: one-hot at round(s)
    W_nn = jnp.where(
        src[None, :] - jnp.round(s_lin)[:, None] == 0.0, 1.0, 0.0
    )
    if legacy_two_kernel:
        W = jnp.where(mode == INTERP_NEAREST, W_nn, W_bl)
        residual = 1.0 - jnp.sum(W, axis=1)
        return W, residual
    # cubic: 4 taps at i0-1 .. i0+2
    cub_off = (-1.0, 0.0, 1.0, 2.0)
    W_cu = taps_matrix(
        i0_raw, cub_off, [_cubic_kernel(frac_raw - k) for k in cub_off]
    )
    # lanczos4: 8 taps at i0-3 .. i0+4, normalized to unit row sum (cv2
    # normalizes its coefficient tables)
    lz_off = tuple(float(k) for k in range(-3, 5))
    lz_w = [_lanczos_kernel(frac_raw - k) for k in lz_off]
    lz_sum = sum(lz_w)
    W_lz = taps_matrix(i0_raw, lz_off, [w / lz_sum for w in lz_w])
    # area: fractional overlap of the source span [b, b+step) with each
    # source pixel cell [i, i+1), normalized by the span
    b = start + o * step
    e = b + step
    b_eff = jnp.where(clamp_t, jnp.clip(b, 0.0, float(src_px)), b)
    e_eff = jnp.where(clamp_t, jnp.clip(e, 0.0, float(src_px)), e)
    cover = jnp.clip(
        jnp.minimum(e_eff[:, None], src[None, :] + 1.0)
        - jnp.maximum(b_eff[:, None], src[None, :]),
        0.0, None,
    )
    W_ar = cover / jnp.maximum(e_eff - b_eff, 1e-12)[:, None]

    W = jnp.select(
        [mode == INTERP_NEAREST, mode == INTERP_CUBIC,
         mode == INTERP_AREA, mode == INTERP_LANCZOS4],
        [W_nn, W_cu, W_ar, W_lz],
        W_bl,
    )
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
    interp_mode=None,
):
    """Crop [y0, y0+crop_h) x [x0, x0+crop_w) (continuous pixels, may extend
    beyond the source) and resize to (out_h_px, out_w_px), all in coefficient
    space.  `background` is the fill PIXEL value minus 128 (level-shifted),
    a scalar or a per-channel-group (k,) array (e.g. (Cb, Cr) for a stacked
    chroma tensor): out-of-bounds regions decode to that constant.
    `interp_mode` (traced int32, an INTERP_* constant) selects the resampling
    kernel — all 5 of the reference's `ResizeRandomInterp` cv2 modes; the
    legacy `nearest` bool is honored when interp_mode is None.

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
                           clamp=clamp_y, mode=interp_mode)
    Wx, rx = interp_matrix(W8 * 8, out_w_px, x0, crop_w, nearest=nearest,
                           clamp=clamp_x, mode=interp_mode)
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
