"""Shared flax layers and conv/pool helpers with TF/Keras-parity semantics.

The reference model zoo is Keras 2 / TF 1.8; to make H5 weight import
bit-compatible, the helpers here pin down the exact Keras defaults:
  * BatchNormalization: momentum 0.99, epsilon 1e-3, per-channel beta/gamma.
  * Conv2D 'same' padding == TF 'SAME' (asymmetric for even kernels).
  * he_normal == truncated normal with stddev sqrt(2 / fan_in).
"""

from __future__ import annotations

import contextlib
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

HE_NORMAL = nn.initializers.he_normal()

# When set (via `pallas_wgrad` below), `conv()` routes every 3x3 stride-1
# SAME dilation-1 conv through `_Conv3x3PallasWgrad`: forward and input
# gradient stay on XLA's convs, only the filter gradient is re-tiled by the
# Pallas kernel in `ops/pallas_conv_grad.py` (XLA's filter-vjp of the
# small-channel stage-1 middles measured ~29% MFU — BENCHMARK.md "Per-conv
# backward micro-profile").  Parameter names/shapes are identical to
# `nn.Conv` ("kernel" HWIO, "bias"), so checkpoints are interchangeable.
_PALLAS_WGRAD_ENABLED = False


def set_pallas_wgrad(enabled: bool) -> None:
    """Globally toggle the Pallas filter-grad path for eligible convs.

    Takes effect at trace time (the switch is read when a model is
    initialized or applied), so set it before `jit`/`init`."""
    global _PALLAS_WGRAD_ENABLED
    _PALLAS_WGRAD_ENABLED = bool(enabled)


def pallas_wgrad_enabled() -> bool:
    return _PALLAS_WGRAD_ENABLED


@contextlib.contextmanager
def pallas_wgrad(enabled: bool = True):
    prev = _PALLAS_WGRAD_ENABLED
    set_pallas_wgrad(enabled)
    try:
        yield
    finally:
        set_pallas_wgrad(prev)


class _Conv3x3PallasWgrad(nn.Module):
    """Drop-in for `nn.Conv(features, (3,3), (1,1), 'SAME')` whose backward
    uses the Pallas filter-grad kernel (interpret mode off-TPU)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from flax.linen import dtypes as flax_dtypes

        from jpeg_detection_resnet_ssd_tpu.ops.pallas_conv_grad import (
            conv3x3_same_pallas_wgrad,
        )

        kernel = self.param(
            "kernel", HE_NORMAL, (3, 3, x.shape[-1], self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        x, kernel, bias = flax_dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        interpret = jax.default_backend() == "cpu"
        y = conv3x3_same_pallas_wgrad(x, kernel, interpret)
        if bias is not None:
            y = y + bias
        return y


class L2Normalization(nn.Module):
    """Channel-wise L2 normalization with a learnable per-channel scale.

    ParseNet-style norm used on SSD's early feature taps; reference:
    `localisation_part/keras_layers/keras_layer_L2Normalization.py:54-63`
    (gamma initialized to 20).
    """

    gamma_init: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            lambda _, shape: jnp.full(shape, self.gamma_init, jnp.float32),
            (x.shape[-1],),
        )
        # K.l2_normalize uses epsilon 1e-12 under the square root.
        denom = jnp.sqrt(
            jnp.maximum(jnp.sum(jnp.square(x), axis=-1, keepdims=True), 1e-12)
        )
        return (x / denom) * gamma.astype(self.dtype)


def conv(
    features: int,
    kernel: int | tuple[int, int] = 3,
    strides: int | tuple[int, int] = 1,
    padding: str | Sequence[tuple[int, int]] = "SAME",
    dilation: int | tuple[int, int] = 1,
    name: str | None = None,
    dtype: Any = jnp.float32,
    use_bias: bool = True,
) -> nn.Conv:
    """Keras-flavoured Conv2D (he_normal kernel, zero bias)."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(strides, int):
        strides = (strides, strides)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if (
        _PALLAS_WGRAD_ENABLED
        and kernel == (3, 3)
        and strides == (1, 1)
        and padding == "SAME"
        and dilation == (1, 1)
    ):
        return _Conv3x3PallasWgrad(
            features=features, use_bias=use_bias, dtype=dtype, name=name
        )
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=strides,
        padding=padding,
        kernel_dilation=dilation,
        use_bias=use_bias,
        kernel_init=HE_NORMAL,
        dtype=dtype,
        name=name,
    )


def batch_norm(train: bool, name: str | None = None, dtype: Any = jnp.float32) -> nn.BatchNorm:
    """Keras-default BatchNormalization (momentum .99, eps 1e-3)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.99,
        epsilon=1e-3,
        dtype=dtype,
        name=name,
    )


def max_pool(x, window=2, strides=2, padding="VALID"):
    if isinstance(window, int):
        window = (window, window)
    if isinstance(strides, int):
        strides = (strides, strides)
    return nn.max_pool(x, window_shape=window, strides=strides, padding=padding)


def zero_pad2d(x, pad: int | tuple = 1):
    """Keras ZeroPadding2D on NHWC tensors."""
    if isinstance(pad, int):
        ph = pw = (pad, pad)
    else:
        ph, pw = pad
    return jnp.pad(x, ((0, 0), ph, pw, (0, 0)))


def upsample2x(x):
    """Keras UpSampling2D() — nearest-neighbour 2x on NHWC."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
