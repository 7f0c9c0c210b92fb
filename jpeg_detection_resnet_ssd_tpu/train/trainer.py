"""The training engine: sharded, jit-compiled train/eval steps.

Replaces the reference's Keras `fit_generator` + Horovod stack
(`classification_part/training.py:179-198`, `config/resnet/config_file.py:121-150`,
`localisation_part/training_dct_pascal_j2d_resnet.py:330-336`) with a single
pjit-style programme: the global batch arrives sharded over the mesh's `data`
axis, the forward/backward runs as one XLA computation per step, and gradient
all-reduce is an XLA collective over ICI — no distributed-optimizer wrapper,
no broadcast callback (state is created once, sharded, and lives on device).

Design notes (TPU-first):
  * one jitted step, state donated, so weights never round-trip to host;
  * BatchNorm batch_stats updated inside the step (flax mutable collection) —
    stats are computed over the LOCAL shard then averaged by XLA's cross-
    replica reduction only if requested (axis_name not used: per-shard stats
    match the reference's per-GPU BN behaviour);
  * loss functions are pluggable pure callables so the same Trainer serves
    classification (xent) and detection (SSDLoss + selective L2).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from jpeg_detection_resnet_ssd_tpu.losses import (
    SSDLoss,
    l2_regularization_loss,
    softmax_cross_entropy,
    top_k_accuracy,
)
from jpeg_detection_resnet_ssd_tpu.parallel import (
    batch_sharding,
    param_shardings,
    replicate_sharding,
)
from jpeg_detection_resnet_ssd_tpu.parallel.mesh import stacked_batch_sharding


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def detection_loss_fn(ssd_loss: SSDLoss = SSDLoss(), l2_scale: float = 5e-4):
    """(params, outputs, batch) -> (loss, metrics) for SSD training.

    batch = {'targets': (B, n_boxes, C+12)}; adds the reference's selective
    L2 penalty over SSD neck/head kernels.
    """

    def fn(params, outputs, batch):
        loss = ssd_loss(batch["targets"], outputs)
        reg = l2_regularization_loss(params, l2_scale) if l2_scale else 0.0
        total = loss + reg
        return total, {"loss": loss, "reg": reg}

    return fn


def classification_loss_fn(weight_decay: float = 0.0):
    """batch = {'labels': int (B,)}; metrics include top-1/top-5."""

    def fn(params, outputs, batch):
        onehot = jax.nn.one_hot(batch["labels"], outputs.shape[-1])
        loss = softmax_cross_entropy(outputs, onehot)
        metrics = {
            "loss": loss,
            "top1": top_k_accuracy(outputs, batch["labels"], 1),
            "top5": top_k_accuracy(outputs, batch["labels"], 5),
        }
        return loss, metrics

    return fn


@dataclasses.dataclass
class Trainer:
    """Builds and owns the sharded train/eval step for one model.

    Args:
      model: flax module whose `__call__(inputs, train)` yields outputs.
      loss_fn: (params, outputs, batch) -> (scalar, metrics dict).
      optimizer: an optax GradientTransformation.
      mesh: jax.sharding.Mesh from `parallel.make_mesh`.
      tp_rule: optional param-sharding rule (see `parallel.param_shardings`).
    """

    model: Any
    loss_fn: Callable
    optimizer: optax.GradientTransformation
    mesh: Any
    tp_rule: Callable | None = None
    donate: bool = True
    # Optional in-step target encoder (gt, gt_mask) -> targets: when set and a
    # batch carries raw padded GT instead of 'targets', encoding fuses into
    # the compiled step.  Host->device traffic drops ~1000x for the labels
    # (40 KB of GT vs ~37 MB of encoded targets at batch 32) — decisive when
    # transfer bandwidth is limited, and the encode itself is sub-ms on TPU.
    target_encoder: Callable | None = None
    # Optional in-step augmentation (batch, rng) -> batch, applied BEFORE the
    # target encoder — e.g. `ops.dct_detect_augment` DCT-domain crop/flip with
    # GT rewrite, making augment + encode + train one compiled program.
    augment_fn: Callable | None = None
    # Freeze BatchNorm during training: normalize with the running statistics
    # (eval-mode BN) and leave batch_stats untouched, the standard detection
    # practice when fine-tuning from a pretrained backbone (the reference
    # imports classification H5 stats, `training_dct_pascal_j2d_resnet.py:
    # 137-149`, though it keeps BN in batch-stat mode).  Besides the
    # semantics, batch-stat BN costs ~12% of the flagship train step
    # (BENCHMARK.md backward attribution: frozen-BN ablation saves 1.5 ms);
    # this makes that measured saving a supported recipe.  Note: the model
    # is applied with train=False, so VGG-head dropout is also disabled —
    # intended for the (dropout-free) detection and ResNet families.
    freeze_bn: bool = False

    def init_state(self, rng, example_inputs) -> TrainState:
        variables = self.model.init(rng, example_inputs, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
        )
        return jax.device_put(state, self.state_shardings(state))

    def state_shardings(self, state: TrainState):
        # Optimizer state and batch stats are sharded by the SAME path-based
        # rule as the params: optax momentum/trace subtrees mirror the param
        # tree (paths end in 'kernel'/'bias'), so a TP-sharded kernel's
        # momentum lands sharded next to it instead of replicated — no extra
        # memory, no per-step resharding.  Leaves the rule doesn't claim
        # (BN stats, schedule counts, EmptyState) replicate as before.
        return TrainState(
            step=replicate_sharding(self.mesh),
            params=param_shardings(self.mesh, state.params, self.tp_rule),
            batch_stats=param_shardings(
                self.mesh, state.batch_stats, self.tp_rule
            ),
            opt_state=param_shardings(
                self.mesh, state.opt_state, self.tp_rule
            ),
        )

    def batch_shardings(self, batch):
        bs = batch_sharding(self.mesh)
        return jax.tree_util.tree_map(lambda _: bs, batch)

    def stacked_batch_shardings(self, batches):
        """Shardings for a K-stacked batch pytree (see `train_steps`)."""
        bs = stacked_batch_sharding(self.mesh)
        return jax.tree_util.tree_map(lambda _: bs, batches)

    def _step(self, state: TrainState, batch, dropout_rng):
        # Independent per-step streams for augmentation vs dropout: folding
        # the same key into both would correlate augmentation randomness with
        # dropout noise every step.
        step_rng = jax.random.fold_in(dropout_rng, state.step)
        aug_rng, drop_rng = jax.random.split(step_rng)
        if self.augment_fn is not None:
            batch = self.augment_fn(batch, aug_rng)
        if self.target_encoder is not None and "targets" not in batch:
            batch = dict(batch)
            batch["targets"] = self.target_encoder(
                batch.pop("gt"), batch.pop("gt_mask")
            )

        def loss_of(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if self.freeze_bn:
                outputs = self.model.apply(
                    variables, batch["inputs"], train=False,
                )
                new_stats = state.batch_stats
            else:
                outputs, mutated = self.model.apply(
                    variables,
                    batch["inputs"],
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": drop_rng},
                )
                new_stats = mutated["batch_stats"]
            loss, metrics = self.loss_fn(params, outputs, batch)
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        updates, new_opt = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = dict(metrics, total_loss=loss)
        return new_state, metrics

    @functools.cached_property
    def train_step(self):
        """Jitted, sharded (state, batch, rng) -> (state, metrics)."""
        return jax.jit(self._step, donate_argnums=(0,) if self.donate else ())

    @functools.cached_property
    def train_steps(self):
        """Fused multi-step: (state, batches, rng) -> (state, metrics).

        `batches` is `train_step`'s batch pytree with a leading scan axis K
        on every leaf (K pre-staged batches); the K optimization steps run as
        ONE compiled program (`lax.scan`), so per-dispatch overhead — host
        round-trips, relay/PCIe latency, Python — is paid once per K steps
        instead of per step.  Step semantics are EXACTLY `train_step`'s:
        `_step` folds the per-step RNG from `state.step`, so augmentation and
        dropout streams are identical to K sequential calls (pinned by
        `tests/test_trainer.py::test_train_steps_scan_matches_sequential`).
        Returned metrics carry the scan axis: each value has shape (K,).

        The reference's Keras `fit_generator` has no analog — every step is a
        separate `session.run` (`classification_part/training.py:179-198`).
        """

        def steps(state, batches, dropout_rng):
            def body(s, b):
                return self._step(s, b, dropout_rng)

            return jax.lax.scan(body, state, batches)

        return jax.jit(steps, donate_argnums=(0,) if self.donate else ())

    def eval_step(self):
        def step(state: TrainState, inputs):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            return self.model.apply(variables, inputs, train=False)

        return jax.jit(step)
