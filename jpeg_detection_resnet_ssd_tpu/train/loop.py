"""The training loop: epochs, logging, checkpointing, NaN guard, restart.

Role of the reference's Keras `fit_generator` orchestration plus its callback
stack (`training.py:159-198`, `training_dct_pascal_j2d_resnet.py:291-336`):
CSVLogger (append mode), ModelCheckpoint (per-epoch, best-tracking),
TerminateOnNaN, restart-from-latest-checkpoint with step/optimizer state
restored (superseding the reference's filename/CSV-parsing reconstruction,
`training.py:74-103`).
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Callable

import jax
import numpy as np
import optax

from jpeg_detection_resnet_ssd_tpu.losses import SSDLoss
from jpeg_detection_resnet_ssd_tpu.models import build_model
from jpeg_detection_resnet_ssd_tpu.parallel import make_mesh
from jpeg_detection_resnet_ssd_tpu.parallel.mesh import tensor_parallel_rule
from jpeg_detection_resnet_ssd_tpu.train.checkpoints import CheckpointManager
from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
from jpeg_detection_resnet_ssd_tpu.train.schedules import (
    keras_inverse_time_decay,
    warmup_linear_scaling,
)
from jpeg_detection_resnet_ssd_tpu.train.trainer import (
    Trainer,
    classification_loss_fn,
    detection_loss_fn,
)


class NaNLossError(RuntimeError):
    """TerminateOnNaN (`config/resnet/config_file.py:76`)."""


def _schedule_value(
    config: ExperimentConfig, step: int, n_replicas: int = 1
) -> float:
    """Value of the ACTUAL training schedule at `step` — must be built with
    the same n_replicas as `build_optimizer`, else the logged lr column skips
    the warmup_linear_scaling branch and lies for multi-replica runs."""
    schedule = _make_schedule(config, n_replicas)
    return float(schedule(step)) if callable(schedule) else float(schedule)


def _make_schedule(config: ExperimentConfig, n_replicas: int):
    if config.warmup_epochs > 0 and n_replicas > 1:
        return warmup_linear_scaling(
            config.learning_rate,
            n_replicas,
            config.steps_per_epoch,
            config.warmup_epochs,
        )
    if config.lr_decay > 0:
        return keras_inverse_time_decay(config.learning_rate, config.lr_decay)
    return config.learning_rate


def build_optimizer(config: ExperimentConfig, n_replicas: int = 1):
    schedule = _make_schedule(config, n_replicas)
    acc_dtype = (None if config.momentum_dtype == "float32"
                 else config.momentum_dtype)
    return optax.sgd(schedule, momentum=config.momentum,
                     nesterov=config.nesterov,
                     accumulator_dtype=acc_dtype)


def build_trainer(config: ExperimentConfig, mesh=None, target_encoder=None,
                  augment_fn=None):
    import jax.numpy as jnp

    mesh = mesh or make_mesh(n_model=config.n_model_shards)
    if config.pallas_wgrad:
        # Trace-time switch: set before any init/apply of the model so every
        # later trace (init_state, train_step, eval) sees it.
        from jpeg_detection_resnet_ssd_tpu.models import layers

        layers.set_pallas_wgrad(True)
    model_kwargs = dict(config.model_kwargs)
    if config.compute_dtype != "float32":
        model_kwargs.setdefault("dtype", jnp.dtype(config.compute_dtype).type)
    if config.remat:
        model_kwargs.setdefault("remat", True)
    module, example_inputs = build_model(config.model, **model_kwargs)
    if config.task == "detection":
        loss_fn = detection_loss_fn(
            SSDLoss(), l2_scale=config.l2_regularization
        )
    else:
        loss_fn = classification_loss_fn()
    n_replicas = mesh.shape.get("data", 1)
    trainer = Trainer(
        model=module,
        loss_fn=loss_fn,
        optimizer=build_optimizer(config, n_replicas),
        mesh=mesh,
        tp_rule=tensor_parallel_rule if config.n_model_shards > 1 else None,
        target_encoder=target_encoder,
        augment_fn=augment_fn,
        freeze_bn=config.freeze_bn,
    )
    return trainer, module, example_inputs


def fit(
    config: ExperimentConfig,
    train_pipeline,
    val_fn: Callable[[Any], dict] | None = None,
    run_dir: str | None = None,
    max_steps: int | None = None,
    mesh=None,
    init_variables=None,
    log_every: int = 50,
    target_encoder=None,
    augment_fn=None,
    save_every: int = 1,
    steps_per_call: int = 1,
) -> tuple[Any, list[dict]]:
    """Train per `config`; returns (final TrainState, history of epoch rows).

    `steps_per_call > 1` fuses that many optimization steps into one compiled
    program (`Trainer.train_steps`): batches are pre-staged host-side, stacked
    on a scan axis, and shipped in one transfer, so per-step dispatch latency
    is paid once per group.  Identical math to sequential steps (same per-step
    RNG folding); epoch and `max_steps` boundaries are respected exactly —
    groups never straddle them (the remainder runs as single steps).
    """
    trainer, module, example_inputs = build_trainer(
        config, mesh, target_encoder, augment_fn
    )
    mesh = trainer.mesh
    n_data = mesh.shape.get("data", 1)
    if config.batch_size % n_data != 0:
        raise ValueError(
            f"global batch_size {config.batch_size} must be divisible by the "
            f"mesh data axis ({n_data} shards)"
        )

    with mesh:
        if init_variables is not None:
            state = trainer.init_state(
                jax.random.PRNGKey(config.seed), example_inputs()
            )
            state = state.replace(
                params=init_variables["params"],
                batch_stats=init_variables.get(
                    "batch_stats", state.batch_stats
                ),
                opt_state=trainer.optimizer.init(init_variables["params"]),
            )
            state = jax.device_put(state, trainer.state_shardings(state))
        else:
            state = trainer.init_state(
                jax.random.PRNGKey(config.seed), example_inputs()
            )

        from jpeg_detection_resnet_ssd_tpu.train.metrics import MetricWriter

        ckpt = None
        writer = MetricWriter(run_dir, tensorboard=config.tensorboard)
        start_epoch = 0
        if run_dir is not None:
            ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
            if config.restart and ckpt.latest_step() is not None:
                state = ckpt.restore(state)
                start_epoch = int(state.step) // max(config.steps_per_epoch, 1)

        dropout_rng = jax.random.PRNGKey(config.seed + 1)
        history = []
        steps_done = 0
        spc = max(int(steps_per_call), 1)
        for epoch in range(start_epoch, config.epochs):
            t0 = time.time()
            epoch_metrics: dict[str, list] = {}
            pending: list = []

            def execute(state, unit):
                """Run 1 batch (single step) or `spc` batches (fused scan)."""
                if len(unit) == 1:
                    b = jax.device_put(
                        unit[0], trainer.batch_shardings(unit[0])
                    )
                    return trainer.train_step(state, b, dropout_rng)
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *unit
                )
                stacked = jax.device_put(
                    stacked, trainer.stacked_batch_shardings(stacked)
                )
                return trainer.train_steps(state, stacked, dropout_rng)

            def bookkeep(metrics, prev_done):
                """NaN guard (on log_every crossings) + metric accumulation."""
                if (steps_done // log_every) != (prev_done // log_every) or (
                    max_steps and steps_done >= max_steps
                ):
                    loss = float(
                        np.asarray(metrics["total_loss"]).ravel()[-1]
                    )
                    if math.isnan(loss) or math.isinf(loss):
                        raise NaNLossError(
                            f"non-finite loss at step {steps_done}"
                        )
                for k, v in metrics.items():
                    epoch_metrics.setdefault(k, []).append(v)

            for batch in train_pipeline:
                # A fused group must not straddle the epoch or max_steps
                # boundary (both are defined per-step); run the remainder as
                # single steps.
                boundary = config.steps_per_epoch - (
                    steps_done % config.steps_per_epoch
                )
                if max_steps:
                    boundary = min(boundary, max_steps - steps_done)
                if spc > 1 and boundary >= spc:
                    pending.append(batch)
                    if len(pending) < spc:
                        continue
                    unit, pending = pending, []
                else:
                    unit = [batch]
                prev_done = steps_done
                state, metrics = execute(state, unit)
                steps_done += len(unit)
                bookkeep(metrics, prev_done)
                if max_steps and steps_done >= max_steps:
                    break
                if steps_done % config.steps_per_epoch == 0:
                    break
            # The pipeline may end mid-group (short epoch): flush leftovers
            # as single steps so no drawn batch is dropped.
            for batch in pending:
                if max_steps and steps_done >= max_steps:
                    break
                prev_done = steps_done
                state, metrics = execute(state, [batch])
                steps_done += 1
                bookkeep(metrics, prev_done)
            row = {
                "epoch": epoch,
                "step": int(state.step),
                "time_s": round(time.time() - t0, 2),
                # lr column (the reference CSVLogger's restart source,
                # `training.py:94-101`; informational here — orbax restores
                # the optimizer state exactly)
                "lr": float(
                    _schedule_value(config, int(state.step), n_data)
                ),
            }

            for k, v in epoch_metrics.items():
                # entries are scalars (single steps) or (K,) arrays (fused
                # groups); each array element is one step's metric.
                row[k] = float(np.mean(np.concatenate(
                    [np.asarray(x, np.float64).ravel() for x in v]
                )))
            if math.isnan(row.get("total_loss", 0.0)):
                raise NaNLossError(f"non-finite epoch loss at epoch {epoch}")
            if val_fn is not None:
                row.update(
                    {f"val_{k}": v for k, v in val_fn(state).items()}
                )
            history.append(row)
            writer.log(row, step=int(state.step))
            # save_every > 1: checkpoint every Nth epoch plus the last one —
            # a full-state orbax save costs a device->host round trip of all
            # params + opt state, which dominates wall clock when epochs are
            # short (small corpora / tunneled devices).
            is_last = (epoch == config.epochs - 1) or (
                max_steps and steps_done >= max_steps
            )
            if ckpt is not None and (
                (epoch + 1) % max(save_every, 1) == 0 or is_last
            ):
                ckpt.save(int(state.step), state, metrics=None)
            if max_steps and steps_done >= max_steps:
                break
        writer.close()
        return state, history


def make_validation_fn(trainer, val_pipeline, loss_only: bool = True):
    """Per-epoch validation hook for `fit(val_fn=...)`.

    Role of the reference's `fit_generator(validation_data=...)` epoch-end
    pass (`training_dct_pascal_j2d_resnet.py:330-336`): runs the model in eval
    mode over `val_pipeline` and returns mean metrics ({'loss': ...} for
    detection batches with 'targets'; classification metrics for batches with
    'labels').
    """
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.losses import SSDLoss

    eval_apply = trainer.eval_step()
    ssd_loss = SSDLoss()

    @jax.jit
    def det_loss(state, inputs, targets):
        preds = eval_apply(state, inputs)
        return ssd_loss(targets, preds)

    @jax.jit
    def cls_metrics(state, inputs, labels):
        logits = eval_apply(state, inputs)
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        from jpeg_detection_resnet_ssd_tpu.losses import (
            softmax_cross_entropy,
            top_k_accuracy,
        )

        return (
            softmax_cross_entropy(logits, onehot),
            top_k_accuracy(logits, labels, 1),
            top_k_accuracy(logits, labels, 5),
        )

    def val_fn(state):
        rows = []
        for batch in val_pipeline:
            if "targets" in batch:
                rows.append(
                    {"loss": float(det_loss(state, batch["inputs"],
                                            batch["targets"]))}
                )
            elif "gt" in batch and trainer.target_encoder is not None:
                targets = trainer.target_encoder(batch["gt"], batch["gt_mask"])
                rows.append(
                    {"loss": float(det_loss(state, batch["inputs"], targets))}
                )
            else:
                loss, t1, t5 = cls_metrics(state, batch["inputs"],
                                           jnp.asarray(batch["labels"]))
                rows.append({"loss": float(loss), "top1": float(t1),
                             "top5": float(t5)})
        if not rows:
            return {}
        keys = rows[0].keys()
        return {k: float(np.mean([r[k] for r in rows])) for k in keys}

    return val_fn
