"""Post-training int8 quantization for the serving path.

TPU MXUs run int8 matmuls/convolutions at ~2x the bf16 rate (v5e: ~394
TOPS int8 vs ~197 TFLOP/s bf16), and the SSD forward pass is conv-FLOP
bound — so int8 is the one serving lever left past bf16.  This module
implements the standard post-training scheme:

  * weights: symmetric per-output-channel int8
    (`s_w[oc] = max|W[..., oc]| / 127`);
  * activations: symmetric per-tensor int8 with STATIC scales from a
    max-calibration pass over representative batches;
  * conv: int8 x int8 -> int32 accumulation
    (`lax.conv_general_dilated(..., preferred_element_type=int32)` — the
    MXU int8 path), then one fused rescale `acc * (s_x * s_w) + bias`.

No model code changes: quantization swaps every `nn.Conv.__call__` at
trace time via `flax.linen.intercept_methods`, so it composes with BN
folding (`serve.folding` — fold first, then calibrate/quantize) and with
AOT export (`serve.export` — the int8 kernels bake into the artifact as
constants, shrinking it ~4x).  Convs whose name matches a `skip` pattern
stay in the float path — by default the raw-DCT input convs and the SSD
box-regression heads, the layers where int8 measurably hurts first.

The reference has no quantization story; this is a beyond-parity serving
feature, accuracy-checked on trained convergence-proxy checkpoints
(`scripts/quantize_eval.py`).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import traverse_util

# Layers where int8 error is disproportionate: the stem convs that consume
# raw DCT coefficients (dynamic range in the hundreds -> coarse per-tensor
# activation steps) and the detection heads (box offsets are regressed in
# units of ~0.1 anchor widths).  The head pattern is kept for back-compat
# even though `models/ssd.py:_SSDHead` now executes its conf/loc pairs as
# raw fused `lax` convs (never intercepted, so always float regardless).
DEFAULT_SKIP = (r"conv1_1_dct", r"head/.*", r"deconv_c[br]")


def _conv_like_types():
    """Module classes the quantizer treats as a conv.

    `_FC6CenterTap` (models/ssd.py) owns an nn.Conv-shaped (kernel, bias)
    pair and applies only the kernel's center tap (exact for its <=dilation
    maps), so it calibrates and quantizes exactly like the `nn.Conv` fc6 it
    replaced.  Imported lazily: serve -> models is acyclic but keeping it
    out of module scope avoids import-order surprises for quantize-only
    users.
    """
    from jpeg_detection_resnet_ssd_tpu.models.ssd import _FC6CenterTap

    return (nn.Conv, _FC6CenterTap)


def _norm2(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _conv_path(mod: nn.Conv) -> str:
    return "/".join(mod.path)


def calibrate_activation_scales(
    module,
    variables,
    batches: Iterable[Any],
    **apply_kwargs,
) -> dict[str, float]:
    """Max-calibration: run `batches` through eval-mode applies, record the
    per-conv peak |input|, return `{conv_path: int8 scale}`.

    Runs UNJITTED so each conv input is concrete (one host readback per
    conv per batch); a handful of batches is enough for max calibration.
    """
    peaks: dict[str, float] = {}

    conv_like = _conv_like_types()

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if isinstance(mod, conv_like) and context.method_name == "__call__":
            path = _conv_path(mod)
            m = float(jnp.max(jnp.abs(args[0])))
            peaks[path] = max(peaks.get(path, 0.0), m)
        return next_fn(*args, **kwargs)

    for batch in batches:
        with nn.intercept_methods(interceptor):
            module.apply(variables, batch, train=False, **apply_kwargs)
    return {p: max(m, 1e-8) / 127.0 for p, m in peaks.items()}


def quantize_conv_weights(
    variables,
    conv_paths: Iterable[str],
    skip: Sequence[str] = DEFAULT_SKIP,
) -> dict[str, tuple[jax.Array, jax.Array]]:
    """Per-output-channel int8 for every conv kernel in `conv_paths`
    (from calibration) whose path matches no `skip` pattern.

    Returns `{path: (w_q int8 (kh,kw,cin,cout), s_w f32 (cout,))}`.
    """
    params = traverse_util.flatten_dict(variables["params"], sep="/")
    out = {}
    skip_res = [re.compile(s) for s in skip]
    for path in conv_paths:
        if any(r.search(path) for r in skip_res):
            continue
        kernel = params[f"{path}/kernel"].astype(jnp.float32)
        s_w = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8
        ) / 127.0
        w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
        out[path] = (w_q, s_w)
    return out


def quantized_call(mod, x, w_q, s_w, s_x):
    """int8 conv + int32 accumulation + fused rescale, matching the float
    conv's geometry (strides/padding/dilation/groups).

    For `_FC6CenterTap` the int8 conv uses the same center-tap slice the
    float path uses — identical output to running the full quantized kernel
    dilated (the off-center taps only ever multiply zero padding)."""
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s_x), -127, 127
    ).astype(jnp.int8)
    if isinstance(mod, nn.Conv):
        strides = _norm2(mod.strides)
        padding = mod.padding
        rhs_dilation = _norm2(mod.kernel_dilation)
        groups = mod.feature_group_count
    else:  # _FC6CenterTap: stride-1 SAME, kernel reduced to its center tap
        w_q = w_q[1:2, 1:2]
        strides, padding, rhs_dilation, groups = (1, 1), "SAME", (1, 1), 1
    acc = jax.lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=strides,
        padding=padding,
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s_x * s_w)
    if getattr(mod, "use_bias", True):  # _FC6CenterTap always has bias
        out = out + mod.variables["params"]["bias"].astype(jnp.float32)
    return out.astype(mod.dtype or x.dtype)


def make_quantized_apply(
    module,
    variables,
    act_scales: dict[str, float],
    qweights: dict[str, tuple[jax.Array, jax.Array]],
) -> Callable:
    """`fn(inputs) -> outputs`: eval-mode apply with every quantized conv
    swapped in at trace time. Jit/export-compatible (the interception
    happens during tracing; the compiled program is pure int8/float XLA)."""

    conv_like = _conv_like_types()

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (
            isinstance(mod, conv_like)
            and context.method_name == "__call__"
            and _conv_path(mod) in qweights
        ):
            path = _conv_path(mod)
            w_q, s_w = qweights[path]
            return quantized_call(mod, args[0], w_q, s_w, act_scales[path])
        return next_fn(*args, **kwargs)

    def fn(*inputs):
        # accepts either the packed tuple or flattened arrays, matching
        # `export.build_serving_fn`'s calling convention
        args = inputs[0] if len(inputs) == 1 else inputs
        with nn.intercept_methods(interceptor):
            return module.apply(variables, args, train=False)

    return fn


def quantize_for_serving(
    module,
    variables,
    calibration_batches: Iterable[Any],
    skip: Sequence[str] = DEFAULT_SKIP,
    fold_bn: bool = True,
) -> tuple[Callable, dict]:
    """One-call front door: fold BN, calibrate, quantize, build the
    executor.  Returns `(fn, info)`; `fn(inputs)` is jit/export-ready and
    `info` reports which convs were quantized vs kept float."""
    from jpeg_detection_resnet_ssd_tpu.serve.folding import fold_batch_norm

    if fold_bn and "batch_stats" in variables:
        variables = fold_batch_norm(variables)
    batches = list(calibration_batches)
    act_scales = calibrate_activation_scales(module, variables, batches)
    qweights = quantize_conv_weights(variables, act_scales, skip=skip)
    fn = make_quantized_apply(module, variables, act_scales, qweights)
    info = {
        "quantized": sorted(qweights),
        "kept_float": sorted(set(act_scales) - set(qweights)),
        "n_calibration_batches": len(batches),
    }
    return fn, info
