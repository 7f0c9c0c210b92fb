"""Flax variables -> Keras-layout H5 weight export.

The inverse of `h5_import`: writes a weights file the reference's Keras
toolchain (`load_weights(by_name=True)`) can consume, enabling two-way weight
exchange and round-trip testing.  Layer scopes become Keras layer groups;
param names map back (scale->gamma, bias->beta for BN, batch_stats -> moving_
mean/variance, L2Normalization gamma -> <name>_gamma).
"""

from __future__ import annotations

import numpy as np

from jpeg_detection_resnet_ssd_tpu.compat.h5_import import _walk_scopes


def _is_leaf_scope(node: dict) -> bool:
    return not any(isinstance(v, dict) for v in node.values())


def export_keras_h5(variables, h5_path: str):
    """Write {'params', 'batch_stats'} flax variables as a Keras weights H5.

    Returns the list of exported layer names.
    """
    import h5py

    params = variables["params"]
    stats = variables.get("batch_stats", {})

    stats_by_name: dict[str, dict] = {}
    for path, node in _walk_scopes(dict(stats)):
        if _is_leaf_scope(node):
            stats_by_name[path[-1]] = node

    exported = []
    with h5py.File(h5_path, "w") as f:
        g = f.create_group("model_weights")
        for path, node in _walk_scopes(dict(params)):
            if not _is_leaf_scope(node):
                continue
            lname = path[-1]
            weights: dict[str, np.ndarray] = {}
            if "scale" in node:  # BatchNorm
                weights["gamma"] = node["scale"]
                weights["beta"] = node["bias"]
                bn_stats = stats_by_name.get(lname, {})
                if "mean" in bn_stats:
                    weights["moving_mean"] = bn_stats["mean"]
                    weights["moving_variance"] = bn_stats["var"]
            elif "gamma" in node:  # L2Normalization
                weights[f"{lname}_gamma"] = node["gamma"]
            else:
                if "kernel" in node:
                    weights["kernel"] = node["kernel"]
                if "bias" in node:
                    weights["bias"] = node["bias"]
            if not weights:
                continue
            grp = g.create_group(lname)
            wnames = [f"{lname}/{w}:0" for w in weights]
            grp.attrs["weight_names"] = np.array(
                [w.encode() for w in wnames], dtype=f"S{max(map(len, wnames)) + 1}"
            )
            for wn, arr in zip(wnames, weights.values()):
                grp.create_dataset(wn, data=np.asarray(arr))
            exported.append(lname)
        g.attrs["layer_names"] = np.array(
            [n.encode() for n in exported],
            dtype=f"S{max((len(n) for n in exported), default=1) + 1}",
        )
    return exported
