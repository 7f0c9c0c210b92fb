"""BatchNorm folding for serving graphs.

In eval mode flax's BatchNorm computes the fixed affine map

    y = (x - mean) * rsqrt(var + eps) * scale + bias = x * a + b,
    a = scale / sqrt(var + eps),   b = bias - mean * a.

Where the BN's input is exactly one conv's output (every `res*`/`bn*`
bottleneck pair and the `conv1`/`bn_conv1` RGB stem — the zoo keeps the
reference's Keras layer naming, `models/resnet.py:73-100`), `a`/`b` absorb
into that conv's kernel and bias and the BN becomes the identity.  The
input-normalizing BNs (`bn_y_in`, `bn_cbcr_in`, `b_norm_*`, `bn_in` — they
normalize raw DCT planes or a concat, reference
`keras_ssd300_dct_j2d_resnet.py:1100-1108`) have no producing conv; they are
rewritten to apply `x * a + b` directly (mean=0, var such that
`var + eps == 1` exactly in float32, scale=a, bias=b), which deletes the
per-inference mean-subtract/rsqrt arithmetic.

This is a SERVING transform: the rewritten `batch_stats` no longer hold real
running statistics, so never resume training from folded variables.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import traverse_util

# Keras-parity eps pinned by models/layers.py:batch_norm.
BN_EPS = 1e-3


def _var_for_exact_unit_rsqrt(eps: float) -> np.float32:
    """float32 v with v + eps == 1.0 exactly, so rsqrt(v + eps) == 1.0."""
    v = np.float32(1.0) - np.float32(eps)
    eps32 = np.float32(eps)
    for _ in range(8):
        s = np.float32(v + eps32)
        if s == np.float32(1.0):
            return v
        v = np.nextafter(v, np.float32(1.0) if s < 1.0 else np.float32(0.0),
                         dtype=np.float32)
    return np.float32(1.0) - eps32  # 1-ulp residual at worst


def _conv_for_bn(bn_name: str) -> list[str]:
    """Candidate producing-conv names for a BN module name (same scope)."""
    cands = []
    if bn_name.startswith("bn") and not bn_name.startswith("bn_"):
        cands.append("res" + bn_name[2:])  # bn4a_branch2a -> res4a_branch2a
    if bn_name == "bn_conv1":
        cands.append("conv1")
    return cands


def bn_fold_pairs(variables) -> tuple[dict[str, str], list[str]]:
    """Discover (bn module path -> conv module path) fold pairs.

    Returns (pairs, affine_only) where `affine_only` lists BN paths with no
    producing conv (folded to a bare per-channel affine instead).  Paths are
    '/'-joined flax module paths.  A name-derived candidate is only accepted
    if the conv exists in the same scope AND its output-channel count matches
    the BN feature count — the naming contract is then verified numerically
    by tests/test_serve.py on every model family.
    """
    params = traverse_util.flatten_dict(variables["params"], sep="/")
    stats = traverse_util.flatten_dict(variables["batch_stats"], sep="/")
    bn_paths = sorted({p.rsplit("/", 1)[0] for p in stats})
    pairs, affine_only = {}, []
    for bn in bn_paths:
        scope, _, name = bn.rpartition("/")
        found = None
        for cand in _conv_for_bn(name):
            conv = f"{scope}/{cand}" if scope else cand
            kernel = params.get(f"{conv}/kernel")
            if kernel is not None and kernel.ndim == 4 and (
                kernel.shape[-1] == stats[f"{bn}/mean"].shape[-1]
            ):
                found = conv
                break
        if found is not None:
            pairs[bn] = found
        else:
            affine_only.append(bn)
    return pairs, affine_only


def fold_batch_norm(variables, eps: float = BN_EPS):
    """Return serving variables with every BatchNorm folded.

    Output has the same pytree structure (drop-in for `module.apply` with
    `train=False`); conv kernels/biases absorb their BN, every folded BN is
    rewritten to the exact identity and every input BN to a bare affine.
    """
    params = dict(traverse_util.flatten_dict(variables["params"], sep="/"))
    stats = dict(traverse_util.flatten_dict(variables["batch_stats"], sep="/"))
    pairs, affine_only = bn_fold_pairs(variables)
    v_unit = jnp.float32(_var_for_exact_unit_rsqrt(eps))

    def bn_affine(bn):
        mean = stats[f"{bn}/mean"].astype(jnp.float32)
        var = stats[f"{bn}/var"].astype(jnp.float32)
        scale = params[f"{bn}/scale"].astype(jnp.float32)
        bias = params[f"{bn}/bias"].astype(jnp.float32)
        a = scale / jnp.sqrt(var + eps)
        return a, bias - mean * a

    def write_bn(bn, a, b):
        params[f"{bn}/scale"] = a
        params[f"{bn}/bias"] = b
        stats[f"{bn}/mean"] = jnp.zeros_like(stats[f"{bn}/mean"])
        stats[f"{bn}/var"] = jnp.full_like(stats[f"{bn}/var"], v_unit)

    for bn, conv in pairs.items():
        a, b = bn_affine(bn)
        kernel = params[f"{conv}/kernel"].astype(jnp.float32)
        params[f"{conv}/kernel"] = kernel * a[None, None, None, :]
        cbias = params.get(f"{conv}/bias")
        cbias = jnp.zeros_like(b) if cbias is None else cbias.astype(jnp.float32)
        params[f"{conv}/bias"] = cbias * a + b
        write_bn(bn, jnp.ones_like(a), jnp.zeros_like(b))
    for bn in affine_only:
        a, b = bn_affine(bn)
        write_bn(bn, a, b)

    out = dict(variables)
    out["params"] = traverse_util.unflatten_dict(params, sep="/")
    out["batch_stats"] = traverse_util.unflatten_dict(stats, sep="/")
    return out
