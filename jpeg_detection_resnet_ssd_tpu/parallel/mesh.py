"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's Horovod data parallelism
(`classification_part/training.py:43-66`, `config/resnet/config_file.py:121-150`):
instead of per-rank processes + NCCL allreduce, we build one
`jax.sharding.Mesh` over all chips, shard the global batch on the `data`
axis, and let XLA insert the gradient all-reduce over ICI.  A `model` axis is
provided for tensor-parallel sharding of the widest layers (not required at
ResNet-50 scale — SURVEY.md §2.2 — but the plumbing is first-class so scaling
up is a config change, not a rewrite).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the mesh
spans all processes' devices and `process_index == 0` gates IO (the analog of
the reference's rank-0-only side effects, `training.py:122-156`).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to pure data parallelism over every device.  The device grid is
    laid out model-axis-minor so tensor-parallel collectives ride the
    fastest/nearest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices"
        )
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over `data`, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for K stacked batches (scan axis first): axis 0 is the scan
    step, axis 1 is the per-step batch sharded over `data`."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tensor_parallel_rule(path: tuple[str, ...], leaf: Any, min_features: int = 1024):
    """Default TP rule: shard the output-feature axis of very wide kernels.

    Applies to conv kernels (H, W, Cin, Cout) and dense kernels (Cin, Cout)
    whose Cout >= `min_features` (fc6/fc7/stage-5 convs at 1024/2048 features);
    everything else is replicated.  With `n_model == 1` this degenerates to
    full replication.
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and path and path[-1] == "kernel":
        if shape[-1] >= min_features:
            return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def param_shardings(mesh: Mesh, params, rule=None):
    """Build a NamedSharding pytree for a parameter tree.

    `rule(path, leaf) -> PartitionSpec`; defaults to `tensor_parallel_rule`
    when the mesh has a non-trivial model axis, else replication.
    """
    if rule is None:
        if mesh.shape.get(MODEL_AXIS, 1) > 1:
            rule = tensor_parallel_rule
        else:
            rule = lambda path, leaf: P()

    def assign(path, leaf):
        keys = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        spec = rule(keys, leaf)
        # Never shard an axis that doesn't divide evenly.
        for dim, axis in zip(getattr(leaf, "shape", ()), spec):
            if axis is not None and dim % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def scale_learning_rate(base_lr: float, n_replicas: int, divider: float = 4.0):
    """Linear lr scaling used by the reference's Horovod config
    (`config/resnet/config_file.py:133-150`, Goyal et al. 2017):
    lr = base_lr * n_replicas / batch_size_divider."""
    return base_lr * n_replicas / divider
