"""Pallas TPU kernel for the filter gradient of 3x3 stride-1 SAME convs.

Why: per-op profiling of the flagship backward pass
(`scripts/profile_conv_bwd.py`, BENCHMARK.md "Per-conv backward
micro-profile") found XLA's filter-vjp of the stage-1 3x3 convs with small
channel counts runs at ~29% MFU (241 us for 3x3x128x128 on a 38x38 map vs
~71 us speed-of-light), while its forward and input-vjp are near the
ceiling.  XLA lowers the filter gradient to a conv that contracts over
batch*spatial with the 128-channel operands as the tiny matmul dims, and
tiles it poorly.

This kernel restates the filter gradient as what it is on the MXU — nine
[C, BHW] x [BHW, K] matmuls sharing one [9, C, K] f32 accumulator in VMEM:

    dW[kh, kw, c, k] = sum_{b,y,x} Xpad[b, y+kh, x+kw, c] * dY[b, y, x, k]

The grid walks batch chunks; each step loads one padded-input block and one
output-grad block into VMEM and accumulates all nine taps' contractions
(`dot_general` contracting (b, y, x) jointly) into the same output block,
which Pallas keeps resident across steps (the index map pins it).

`conv3x3_same_pallas_wgrad` wraps the kernel in a `custom_vjp` conv whose
forward and input-grad stay on XLA's fast paths; only the filter grad is
replaced.  Semantics match `lax.conv_general_dilated(..., 'SAME')` with
NHWC/HWIO exactly (same contraction order caveats as any matmul re-tiling:
f32 accumulation, reduction-order-only drift vs XLA).

Reference capability: the conv backward inside Keras/TF `fit_generator`
(`/root/reference/localisation_part/training_dct_pascal_j2d_resnet.py:330-336`)
— re-designed TPU-first rather than translated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# Scoped-VMEM ceiling requested from Mosaic (default is 16MB; v5e has
# 128MB physical VMEM, so 64MB leaves plenty for the compiler's own use).
_VMEM_LIMIT = 64 * 1024 * 1024


def _pick_batch_chunk(b: int, hp: int, wp: int, c: int, k: int,
                      h: int, w: int) -> int:
    """Largest divisor of `b` whose per-step VMEM footprint fits the budget.

    Budgets the three double-buffered kw-view input blocks + the dy block,
    Mosaic stack temporaries for the reshaped matmul operands (worst case:
    each of the nine [bb*h*w, c] slices plus the [bb*h*w, k] dy copy is
    materialized, even though the aligned layout usually lets the reshape
    be a view), and the f32 accumulator, against _VMEM_LIMIT.
    """
    budget = _VMEM_LIMIT - 9 * c * k * 4 - 2 * 1024 * 1024
    best = 1
    for bb in range(1, b + 1):
        if b % bb:
            continue
        blocks = 2 * (3 * bb * hp * wp * c * 2 + bb * h * w * k * 2)
        stack = 9 * bb * h * w * c * 2 + bb * h * w * k * 2
        if blocks + stack <= budget:
            best = bb
    return best


def _filter_grad_kernel(x0_ref, x1_ref, x2_ref, dy_ref, dw_ref,
                        *, h: int, w: int):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    # Mosaic's tpu.matmul contracts exactly one dim — collapse (b, y, x)
    # into the leading dim and contract 2-D: [BHW, C]^T x [BHW, K].
    # TILE ALIGNMENT (the reason for the host-side prep in
    # `conv3x3_filter_grad`): the minor two dims of every operand here are
    # (w, channels) with w a multiple of the 8-sublane tile, the kw shifts
    # were materialized OUTSIDE the kernel, and the kh shift below slices a
    # non-minor dim — so each reshape collapses whole tiles and lowers to
    # plain address arithmetic instead of per-row shuffles (the original
    # in-kernel [kw:kw+38] slice + reshape forced Mosaic into misaligned
    # relayouts: ~9 min compiles and shuffle-bloated code).
    bb = dy_ref.shape[0]
    dy = dy_ref[...].reshape(bb * h * w, -1)
    for kw, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for kh in range(3):
            xs = x_ref[:, kh:kh + h, :, :].reshape(bb * h * w, -1)
            dw_ref[kh * 3 + kw] += jax.lax.dot_general(
                xs,
                dy,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_filter_grad(x: jax.Array, dy: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """dW (3,3,C,K) f32 for a 3x3 stride-1 SAME NHWC conv.

    `x` (B,H,W,C) is the conv input, `dy` (B,H,W,K) the output cotangent.

    Host-side prep for tile alignment (see `_filter_grad_kernel`): H and W
    are zero-padded up to the 8-sublane tile (padded output rows carry
    dy = 0, padded input columns meet dy positions whose true taps are in
    the SAME-pad zeros — both contribute exactly zero to dW), and the three
    kw-shifted views are materialized by XLA as fused aligned copies.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h0, w0, c = x.shape
    k = dy.shape[-1]
    h = -(-h0 // 8) * 8
    w = -(-w0 // 8) * 8
    xq = jnp.pad(x, ((0, 0), (1, h - h0 + 1), (1, w - w0 + 1), (0, 0)))
    dyq = jnp.pad(dy, ((0, 0), (0, h - h0), (0, w - w0), (0, 0)))
    # (b, h+2, w, c) kw-shifted views; the kh shift happens in-kernel on a
    # non-minor dim.
    xkw = [xq[:, :, kw:kw + w, :] for kw in range(3)]
    hp = h + 2
    bb = _pick_batch_chunk(b, hp, w, c, k, h, w)

    dw9 = pl.pallas_call(
        functools.partial(_filter_grad_kernel, h=h, w=w),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, hp, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, hp, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, hp, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, h, w, k), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9, c, k), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, c, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*xkw, dyq)
    return dw9.reshape(3, 3, c, k)


@jax.jit
def conv3x3_filter_grad_xla_dots(x: jax.Array, dy: jax.Array) -> jax.Array:
    """The same nine-tap matmul restatement in plain XLA (no Pallas).

    Each tap is one [BHW, C]^T x [BHW, K] `dot_general` on a shifted slice
    of the padded input — the MXU-shaped contraction XLA's conv-based
    filter-vjp fails to tile.  Costs 9 extra HBM reads of x versus the
    Pallas kernel's VMEM-resident accumulator, but has zero Mosaic compile
    risk; kept as the fallback arm and for the A/B in
    `scripts/profile_pallas_wgrad.py`.
    """
    b, h, w, c = x.shape
    k = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dyf = dy.reshape(b * h * w, k)
    taps = []
    for kh in range(3):
        for kw in range(3):
            xs = xp[:, kh:kh + h, kw:kw + w, :].reshape(b * h * w, c)
            taps.append(jax.lax.dot_general(
                xs, dyf,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
    return jnp.stack(taps).reshape(3, 3, c, k)


_DIMNUMS = ("NHWC", "HWIO", "NHWC")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_same_pallas_wgrad(x: jax.Array, w: jax.Array,
                              interpret: bool = False) -> jax.Array:
    """3x3 stride-1 SAME conv; backward uses the Pallas filter-grad kernel.

    Forward and the input gradient are XLA's own convs (both already near
    the MXU ceiling); only the filter gradient is re-tiled.  dW is returned
    in the weight's dtype (f32 accumulation inside the kernel).
    """
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=_DIMNUMS
    )


def _fwd(x, w, interpret):
    return conv3x3_same_pallas_wgrad(x, w, interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    # Input grad: correlate g with the spatially-flipped, io-swapped kernel
    # (exact for stride-1 SAME 3x3: the pad is symmetric (1,1)).
    w_t = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        g, w_t, (1, 1), "SAME", dimension_numbers=_DIMNUMS
    )
    dw = conv3x3_filter_grad(x, g, interpret=interpret)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3_same_pallas_wgrad.defvjp(_fwd, _bwd)


def reference_filter_grad(x: np.ndarray, dy: np.ndarray) -> np.ndarray:
    """NumPy oracle for tests: direct 6-loop contraction in f64."""
    b, h, w, c = x.shape
    k = dy.shape[-1]
    xp = np.zeros((b, h + 2, w + 2, c), np.float64)
    xp[:, 1:-1, 1:-1, :] = x
    dw = np.zeros((3, 3, c, k), np.float64)
    for kh in range(3):
        for kw in range(3):
            xs = xp[:, kh:kh + h, kw:kw + w, :].reshape(-1, c)
            dw[kh, kw] = xs.T @ dy.reshape(-1, k).astype(np.float64)
    return dw
