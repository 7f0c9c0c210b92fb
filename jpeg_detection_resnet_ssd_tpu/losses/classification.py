"""Classification losses / metrics + selective L2 regularization.

The reference compiles with categorical cross-entropy over softmax outputs and
top-1/top-5 metrics (`classification_part/config/resnet/config_file.py:19-22,
61-65`); our models emit logits, so the loss is computed from logits (same
value, better numerics).  `l2_regularization_loss` reproduces the Keras
kernel_regularizer=l2(5e-4) attached to SSD neck/head convs
(`keras_ssd300_dct_j2d_resnet.py:483-675`) as an explicit penalty over the
matching parameter subtree.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jnp.ndarray, labels_onehot: jnp.ndarray):
    """Mean categorical cross-entropy from logits."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels_onehot * logp, axis=-1))


def top_k_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, k: int = 1):
    """labels: int class ids (B,). Matches keras top_k_categorical_accuracy."""
    topk = jax.lax.top_k(logits, min(k, logits.shape[-1]))[1]  # (B, k)
    hit = jnp.any(topk == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))


# SSD neck/head layer names that carry l2(5e-4) in the reference.
_SSD_REGULARIZED_PREFIXES = (
    "fc6",
    "fc7",
    "conv6_",
    "conv7_",
    "conv8_",
    "conv9_",
    "conv1_1_dct",
    "conv4_",
    "conv5_",
)


def default_ssd_reg_filter(path: tuple[str, ...]) -> bool:
    name = path[-2] if len(path) >= 2 else path[0]
    return (
        any(name.startswith(p) for p in _SSD_REGULARIZED_PREFIXES)
        or "_mbox_" in name
    ) and path[-1] == "kernel"


def l2_regularization_loss(
    params,
    scale: float = 5e-4,
    name_filter: Callable[[tuple[str, ...]], bool] = default_ssd_reg_filter,
):
    """sum(scale * ||W||^2) over kernels selected by `name_filter`.

    Keras `l2(l)` adds l * sum(W^2) (no 1/2 factor) — replicated here.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in flat:
        keys = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        if name_filter(keys):
            total = total + scale * jnp.sum(jnp.square(leaf))
    return total
