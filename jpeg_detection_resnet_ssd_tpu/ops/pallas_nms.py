"""Batched greedy NMS as a single Pallas TPU kernel.

The XLA formulation of the suppression loop (`boxes.decode._greedy_nms_mask`)
spends ~8 ms/batch in loop/dynamic-slice overhead: 400 sequential HLO steps,
each gathering one candidate along the LANE dimension of a
vmap(batch) x vmap(class) layout.  This kernel restructures the problem:

  * all (batch x class) NMS problems are stacked along the LANE axis
    (K candidates in sublanes, N = B*C problems in lanes), so step i's
    candidate row is a cheap SUBLANE slice shared by every problem;
  * the full working set (4 coord planes + areas + scores + keep mask,
    (K, N) f32 each) lives in VMEM for the whole loop — ~9 MB at K=400,
    N=672 — so the 400 suppression steps never touch HBM;
  * masks are f32 0/1 and the keep plane is updated in place.

Exactness: identical greedy semantics to the XLA/NumPy implementations
(verified in tests, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _nms_kernel(x0_ref, y0_ref, x1_ref, y1_ref, s_ref, keep_ref, area_ref,
                *, iou_threshold: float, border_delta: float):
    from jax.experimental import pallas as pl

    K = x0_ref.shape[0]
    d = border_delta
    area_ref[...] = (x1_ref[...] - x0_ref[...] + d) * (
        y1_ref[...] - y0_ref[...] + d
    )
    keep_ref[...] = jnp.ones_like(keep_ref)
    # TPU iota must be integer-typed (Mosaic verification).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, keep_ref.shape, 0)

    def body(i, _):
        x0i = x0_ref[pl.ds(i, 1), :]  # (1, N) sublane slice
        y0i = y0_ref[pl.ds(i, 1), :]
        x1i = x1_ref[pl.ds(i, 1), :]
        y1i = y1_ref[pl.ds(i, 1), :]
        ai = area_ref[pl.ds(i, 1), :]
        alive = keep_ref[pl.ds(i, 1), :] * (
            s_ref[pl.ds(i, 1), :] > 0.0
        ).astype(jnp.float32)

        iw = jnp.maximum(
            0.0, jnp.minimum(x1_ref[...], x1i) - jnp.maximum(x0_ref[...], x0i) + d
        )
        ih = jnp.maximum(
            0.0, jnp.minimum(y1_ref[...], y1i) - jnp.maximum(y0_ref[...], y0i) + d
        )
        inter = iw * ih
        union = area_ref[...] + ai - inter
        iou = inter / jnp.maximum(union, 1e-12)

        suppress = (
            (iou > iou_threshold).astype(jnp.float32)
            * (row_ids > i).astype(jnp.float32)
            * alive
        )
        keep_ref[...] = keep_ref[...] * (1.0 - suppress)
        return 0

    jax.lax.fori_loop(0, K, body, 0)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "border_delta", "interpret")
)
def pallas_batched_nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.45,
    border_delta: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """Greedy-NMS keep mask for stacked problems.

    Args:
      boxes: (N, K, 4) corner boxes, each problem sorted by descending score.
      scores: (N, K) scores; 0 marks invalid slots.

    Returns:
      keep: (N, K) bool.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, K, _ = boxes.shape
    planes = [
        jnp.transpose(boxes[..., i]).astype(jnp.float32) for i in range(4)
    ]  # 4 x (K, N)
    s = jnp.transpose(scores).astype(jnp.float32)

    kernel = functools.partial(
        _nms_kernel, iou_threshold=iou_threshold, border_delta=border_delta
    )
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, N), jnp.float32)],
        interpret=interpret,
    )(*planes, s)
    return jnp.transpose(keep > 0.5) & (scores > 0.0)
