"""Experiment configuration + run-directory management.

Replaces the reference's config-as-Python-class-per-directory machinery
(`template_keras/config/template_config.py:10-121`, imported via sys.path
injection at `training.py:106-107`) with one serializable dataclass.  The
reference's reproducibility behaviours are preserved:

  * experiment dirs named `{workspace}_{project}_{32-char random key}` with
    `checkpoints/` and `results/` subdirs (`training.py:117-141`);
  * the exact config is snapshotted into the run dir (`saved_config.py`
  * role, `training.py:144-156`) — here as `saved_config.json`, which
    `evaluate`/`infer` re-load for exact reproduction (`evaluate.py:10-12`).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import secrets
from typing import Any


@dataclasses.dataclass
class ExperimentConfig:
    # model
    model: str = "ssd300_ssd_custom"
    model_kwargs: dict = dataclasses.field(default_factory=dict)
    task: str = "detection"  # or "classification"
    input_format: str = "dct"

    # optimization (reference defaults: det SGD 1e-3 m.9; cls SGD .1 m.9
    # nesterov decay 1e-4 — `training_dct_pascal_j2d_resnet.py:152`,
    # `config/resnet/config_file.py:51-59`)
    learning_rate: float = 1e-3
    momentum: float = 0.9
    nesterov: bool = False
    lr_decay: float = 0.0
    l2_regularization: float = 5e-4
    warmup_epochs: int = 0
    batch_size: int = 32
    epochs: int = 480
    steps_per_epoch: int = 1000

    # data
    train_data: dict = dataclasses.field(default_factory=dict)
    val_data: dict = dataclasses.field(default_factory=dict)
    num_workers: int = 8
    seed: int = 0

    # parallelism / precision
    n_model_shards: int = 1
    # bfloat16 compute is the TPU default (params stay f32): +41% training
    # throughput with convergence equivalent to f32 (BENCHMARK.md); set
    # 'float32' to reproduce the reference's numerics exactly.
    compute_dtype: str = "bfloat16"  # 'float32' | 'bfloat16'
    # Momentum accumulator dtype. The SGD update is pure HBM traffic
    # (read params+momentum+grads, write params+momentum: ~540 MB/step on
    # the flagship); 'bfloat16' halves the momentum share of that traffic.
    # Off by default: it changes update numerics (momentum rounds to 8-bit
    # mantissa each step) — opt in for throughput-critical large-scale runs.
    momentum_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # Route eligible 3x3 stride-1 convs through the Pallas filter-grad
    # kernel (ops/pallas_conv_grad.py): forward and input-grad stay on
    # XLA's convs, only the filter gradient is re-tiled (XLA's filter-vjp
    # of the small-channel stage-1 middles measured ~29% MFU —
    # BENCHMARK.md "Per-conv backward micro-profile").  Identical param
    # tree and forward numerics; dW differs by reduction order only.
    pallas_wgrad: bool = False
    remat: bool = False  # rematerialize ResNet bottleneck branches (memory)
    # Train with BatchNorm frozen (eval-mode normalization, running stats
    # untouched) — the standard recipe when fine-tuning a detector from a
    # pretrained backbone whose BN statistics were imported (compat H5
    # import fills them).  Also a measured throughput lever: batch-stat BN
    # costs ~12% of the flagship train step (BENCHMARK.md frozen-BN
    # ablation, 1.5 ms/step).  The reference always trains BN
    # (`training_dct_pascal_j2d_resnet.py`), so this is off by default.
    freeze_bn: bool = False

    # observability
    tensorboard: bool = False

    # experiment management
    workspace: str = "local"
    project: str = "jpeg_dct"
    output_dir: str = "experiments"
    pretrained_weights: str | None = None  # Keras H5 for by-name transfer
    restart: bool = False

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "ExperimentConfig":
        data = json.loads(text)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in fields})

    @classmethod
    def load(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            return cls.from_json(f.read())


def create_run_dir(config: ExperimentConfig, key: str | None = None) -> str:
    """Create `{output_dir}/{workspace}_{project}_{key}/` with checkpoints/ and
    results/ subdirs and a config snapshot; returns the run dir path."""
    key = key or secrets.token_hex(16)  # 32 hex chars, as the reference
    run_dir = os.path.join(
        config.output_dir, f"{config.workspace}_{config.project}_{key}"
    )
    os.makedirs(os.path.join(run_dir, "checkpoints"), exist_ok=True)
    os.makedirs(os.path.join(run_dir, "results"), exist_ok=True)
    with open(os.path.join(run_dir, "saved_config.json"), "w") as f:
        f.write(config.to_json())
    return run_dir


def find_latest_run(config: ExperimentConfig) -> str | None:
    """Most recently modified run dir for this workspace/project (restart
    support, `training.py:74-103`)."""
    prefix = f"{config.workspace}_{config.project}_"
    base = config.output_dir
    if not os.path.isdir(base):
        return None
    # Anchor the match to the full dir shape ({prefix}{32-hex-key}, the
    # create_run_dir format): a raw prefix match would let a project whose
    # name is a proper prefix of another (e.g. `jpeg` vs `jpeg_dct`) resume
    # a FOREIGN run and restore against a mismatched param tree.
    key_re = re.compile(r"^[0-9a-f]{32}$")
    candidates = [
        os.path.join(base, d)
        for d in os.listdir(base)
        if d.startswith(prefix)
        and key_re.match(d[len(prefix):])
        and os.path.isdir(os.path.join(base, d))
    ]
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)
