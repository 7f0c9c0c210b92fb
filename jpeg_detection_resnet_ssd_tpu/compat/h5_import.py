"""Keras H5 -> flax param-tree weight import, keyed by layer name.

The reference's entire pretrained/transfer story is Keras
`load_weights(by_name=True)` (`resnet_dct.py:448`, `training.py:163`,
`training_dct_pascal_j2d_resnet.py:138-149`), with layer-name engineering for
partial transfer (class-suffixed head names, `_other_names` model variants).
Our flax modules use the same layer names as param scopes, so the same
semantics hold: for every H5 layer whose name matches a module scope, copy the
weights; silently skip everything else (and report what happened).

Keras TF-format weight layouts map 1:1:
  Conv2D     kernel (kh, kw, cin, cout), bias (cout,)        -> kernel/bias
  Dense      kernel (cin, cout), bias                         -> kernel/bias
  BatchNorm  gamma, beta, moving_mean, moving_variance        -> params.scale/
             params.bias + batch_stats.mean/var
  L2Normalization  <name>_gamma (c,)                          -> gamma
  Conv2DTranspose  kernel (kh, kw, cout, cin)                 -> transposed to
             flax ConvTranspose layout (kh, kw, cin, cout)
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _h5_weight_group(f):
    """Handle both `model.save()` (weights under 'model_weights') and
    `model.save_weights()` (top-level) H5 layouts."""
    return f["model_weights"] if "model_weights" in f else f


def list_h5_layers(h5_path: str) -> dict[str, list[tuple[str, tuple]]]:
    """{layer_name: [(weight_name, shape), ...]} for layers with weights."""
    import h5py

    out = {}
    with h5py.File(h5_path, "r") as f:
        g = _h5_weight_group(f)
        for lname in g:
            grp = g[lname]
            names = grp.attrs.get("weight_names", [])
            weights = []
            for wn in names:
                wn = wn.decode() if isinstance(wn, bytes) else str(wn)
                weights.append((wn, tuple(grp[wn].shape)))
            if weights:
                out[lname] = weights
    return out


def load_keras_h5_weights(h5_path: str) -> dict[str, dict[str, np.ndarray]]:
    """{layer_name: {short_weight_name: array}} from a Keras H5 file."""
    import h5py

    out: dict[str, dict[str, np.ndarray]] = {}
    with h5py.File(h5_path, "r") as f:
        g = _h5_weight_group(f)
        for lname in g:
            grp = g[lname]
            names = grp.attrs.get("weight_names", [])
            weights = {}
            for wn in names:
                wn = wn.decode() if isinstance(wn, bytes) else str(wn)
                short = wn.split("/")[-1].split(":")[0]
                weights[short] = np.asarray(grp[wn])
            if weights:
                out[lname] = weights
    return out


_KERAS_TO_FLAX_PARAM = {
    "kernel": "kernel",
    "bias": "bias",
    "gamma": "scale",   # BatchNorm
    "beta": "bias",     # BatchNorm
}
_KERAS_TO_FLAX_STATS = {
    "moving_mean": "mean",
    "moving_variance": "var",
}


def _walk_scopes(tree: dict, prefix=()):
    """Yield (path, subtree) for every dict node."""
    for k, v in tree.items():
        if isinstance(v, dict):
            yield prefix + (k,), v
            yield from _walk_scopes(v, prefix + (k,))


def import_weights_by_name(
    variables: Any,
    h5_path: str,
    rename: dict[str, str] | None = None,
    transpose_conv_layers: tuple = (),
    verbose: bool = False,
):
    """Return a new `variables` dict with matching H5 layer weights loaded.

    Args:
      variables: flax variables ({'params': ..., 'batch_stats': ...}).
      rename: optional {h5_layer_name: our_scope_name} overrides (the role of
        the reference's ignore-lists and `_other_names` model files,
        `training_dct_pascal_j2d.py:126-133`).
      transpose_conv_layers: layer names whose kernels are Conv2DTranspose
        (Keras stores (kh, kw, cout, cin)).

    Returns (new_variables, report) where report lists loaded / skipped /
    shape-mismatched layer names.
    """
    import jax

    h5 = load_keras_h5_weights(h5_path)
    rename = rename or {}

    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(
        np.asarray, dict(variables.get("batch_stats", {}))
    )

    # layer-name -> (tree kind, path) index over our scopes
    scope_index: dict[str, list[tuple[str, tuple]]] = {}
    for kind, tree in (("params", params), ("batch_stats", stats)):
        for path, node in _walk_scopes(tree):
            if any(isinstance(v, dict) for v in node.values()):
                continue  # only leaf scopes (actual layers)
            scope_index.setdefault(path[-1], []).append((kind, path))

    report = {"loaded": [], "skipped": [], "mismatched": []}

    def _get(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    for lname, weights in h5.items():
        target = rename.get(lname, lname)
        entries = scope_index.get(target)
        if not entries:
            report["skipped"].append(lname)
            continue
        ok = True
        staged = []
        for wname, arr in weights.items():
            if wname in _KERAS_TO_FLAX_STATS:
                kind, key = "batch_stats", _KERAS_TO_FLAX_STATS[wname]
            elif wname in _KERAS_TO_FLAX_PARAM:
                kind, key = "params", _KERAS_TO_FLAX_PARAM[wname]
            elif wname.endswith("_gamma"):  # L2Normalization
                kind, key = "params", "gamma"
            else:
                ok = False
                break
            if lname in transpose_conv_layers and key == "kernel":
                arr = np.transpose(arr, (0, 1, 3, 2))
            path = next((p for k, p in entries if k == kind), None)
            if path is None:
                ok = False
                break
            tree = params if kind == "params" else stats
            node = _get(tree, path)
            if key not in node or tuple(node[key].shape) != tuple(arr.shape):
                ok = False
                break
            staged.append((tree, path, key, arr))
        if not ok:
            report["mismatched"].append(lname)
            continue
        for tree, path, key, arr in staged:
            _get(tree, path)[key] = arr.astype(_get(tree, path)[key].dtype)
        report["loaded"].append(lname)

    if verbose:
        print(
            f"h5 import: {len(report['loaded'])} loaded, "
            f"{len(report['skipped'])} skipped, "
            f"{len(report['mismatched'])} mismatched"
        )
    new_vars = dict(variables)
    new_vars["params"] = params
    if stats:
        new_vars["batch_stats"] = stats
    return new_vars, report
