"""Trainer: sharded train steps converge and shard correctly on the 8-CPU mesh.

Unit tests use small toy modules (full-size models multiply replicated compute
8x on the shared-thread virtual CPU mesh); the full flagship training step is
exercised once via `__graft_entry__.dryrun_multichip`, exactly as the driver
runs it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from jpeg_detection_resnet_ssd_tpu.parallel import make_mesh
from jpeg_detection_resnet_ssd_tpu.parallel.mesh import tensor_parallel_rule
from jpeg_detection_resnet_ssd_tpu.train import (
    Trainer,
    classification_loss_fn,
    detection_loss_fn,
    keras_inverse_time_decay,
    warmup_linear_scaling,
)


class TinyClassifier(nn.Module):
    """BN + conv + dense head: exercises batch_stats, dropout, params."""

    num_classes: int = 4

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        y, cbcr = inputs
        x = nn.BatchNorm(use_running_average=not train, name="bn")(y)
        x = nn.relu(nn.Conv(8, (3, 3), name="conv")(x))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc")(x)


class TinyDetector(nn.Module):
    """Tiny net emitting an SSD-layout prediction tensor; has a wide 'fc6'
    kernel so the tensor-parallel rule engages."""

    n_classes: int = 3
    n_boxes: int = 32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        y, cbcr = inputs
        x = nn.relu(nn.Conv(1024, (3, 3), name="fc6")(y))
        x = jnp.mean(x, axis=(1, 2))
        out = nn.Dense(self.n_boxes * (self.n_classes + 1 + 4), name="head")(x)
        out = out.reshape(x.shape[0], self.n_boxes, -1)
        conf = jax.nn.softmax(out[..., : self.n_classes + 1])
        loc = out[..., self.n_classes + 1 :]
        anchors = jnp.ones(loc.shape[:-1] + (8,), loc.dtype) * 0.1
        return jnp.concatenate([conf, loc, anchors], axis=-1)


def _toy_batch(rng, B=8):
    y = rng.normal(0, 1, (B, 12, 12, 16)).astype(np.float32)
    cbcr = rng.normal(0, 1, (B, 6, 6, 32)).astype(np.float32)
    return y, cbcr


def test_classification_step_reduces_loss(rng):
    mesh = make_mesh()  # 8 x 1
    trainer = Trainer(
        model=TinyClassifier(),
        loss_fn=classification_loss_fn(),
        optimizer=optax.sgd(0.05, momentum=0.9),
        mesh=mesh,
        donate=False,
    )
    y, cbcr = _toy_batch(rng)
    labels = rng.integers(0, 4, 8)
    with mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), (y[:1], cbcr[:1]))
        batch = {"inputs": (y, cbcr), "labels": labels}
        batch = jax.device_put(batch, trainer.batch_shardings(batch))
        losses = []
        for i in range(8):
            state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert "top5" in metrics


def test_detection_step_tp_mesh(rng):
    mesh = make_mesh(n_data=4, n_model=2)
    model = TinyDetector()
    trainer = Trainer(
        model=model,
        loss_fn=detection_loss_fn(l2_scale=5e-4),
        optimizer=optax.sgd(1e-3, momentum=0.9),
        mesh=mesh,
        tp_rule=tensor_parallel_rule,
        donate=False,
    )
    B, N, C = 4, 32, 3
    y, cbcr = _toy_batch(rng, B)
    targets = np.zeros((B, N, C + 1 + 12), dtype=np.float32)
    targets[..., 0] = 1.0
    for b in range(B):
        idx = rng.integers(0, N, 3)
        targets[b, idx, 0] = 0.0
        targets[b, idx, 1 + rng.integers(0, C)] = 1.0
    targets[..., -4:] = [0.1, 0.1, 0.2, 0.2]
    with mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), (y[:1], cbcr[:1]))
        # wide kernels (>=1024 features) sharded over the model axis
        fc6 = state.params["fc6"]["kernel"]
        assert fc6.sharding.spec[-1] == "model"
        batch = {"inputs": (y, cbcr), "targets": targets}
        batch = jax.device_put(batch, trainer.batch_shardings(batch))
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["reg"]) > 0


def test_tp_optimizer_state_follows_param_sharding(rng):
    """Under a tp_rule, SGD momentum for model-sharded kernels must be
    sharded like the kernel (not replicated): no extra memory, no per-step
    resharding."""
    mesh = make_mesh(n_data=4, n_model=2)
    trainer = Trainer(
        model=TinyDetector(),
        loss_fn=detection_loss_fn(l2_scale=0.0),
        optimizer=optax.sgd(1e-3, momentum=0.9),
        mesh=mesh,
        tp_rule=tensor_parallel_rule,
        donate=False,
    )
    y, cbcr = _toy_batch(rng, 4)
    with mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), (y[:1], cbcr[:1]))
    momentum = state.opt_state[0].trace
    assert momentum["fc6"]["kernel"].sharding.spec[-1] == "model"
    # narrow leaves stay replicated
    assert momentum["fc6"]["bias"].sharding.spec == ()
    # batch_stats replicated (BN-free net has empty stats; check via shardings
    # tree instead)
    sh = trainer.state_shardings(state)
    assert sh.opt_state[0].trace["fc6"]["kernel"].spec[-1] == "model"


def test_schedules():
    s = keras_inverse_time_decay(0.1, 1e-4)
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(10000)) == pytest.approx(0.05)
    w = warmup_linear_scaling(0.1, n_replicas=16, steps_per_epoch=10,
                              warmup_epochs=5)
    assert float(w(0)) == pytest.approx(0.1)
    assert float(w(50)) == pytest.approx(0.4)  # 0.1 * 16 / 4
    assert float(w(500)) == pytest.approx(0.4)


def test_momentum_dtype_bf16():
    """momentum_dtype='bfloat16' casts the SGD trace (halving its HBM
    share of the update) while params stay f32 and training still steps."""
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_optimizer

    config = ExperimentConfig(momentum_dtype="bfloat16", lr_decay=0.0,
                              learning_rate=0.1)
    tx = build_optimizer(config)
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    state = tx.init(params)
    traces = [l for l in jax.tree_util.tree_leaves(state)
              if hasattr(l, "dtype")]
    assert any(t.dtype == jnp.bfloat16 for t in traces), traces

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    for _ in range(3):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert params["w"].dtype == jnp.float32
    assert float(loss(params)) < 16.0  # strictly decreased from 1.0*16

    # default config keeps the reference-exact f32 trace
    tx32 = build_optimizer(ExperimentConfig())
    s32 = tx32.init({"w": jnp.ones((2,), jnp.float32)})
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(s32)
               if hasattr(l, "dtype"))


def test_freeze_bn_step(rng):
    """freeze_bn=True trains with eval-mode BN: running statistics stay
    bit-identical across steps while params still update and the loss
    still falls (the standard pretrained-backbone fine-tune recipe; also
    the measured ~12%-of-step BN saving, BENCHMARK.md frozen-BN ablation)."""
    mesh = make_mesh()
    y, cbcr = _toy_batch(rng)
    labels = rng.integers(0, 4, 8)

    trainer = Trainer(
        model=TinyClassifier(),
        loss_fn=classification_loss_fn(),
        optimizer=optax.sgd(0.05, momentum=0.9),
        mesh=mesh,
        donate=False,
        freeze_bn=True,
    )
    with mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), (y[:1], cbcr[:1]))
        stats0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
        params0 = jax.tree_util.tree_map(np.asarray, state.params)
        batch = {"inputs": (y, cbcr), "labels": labels}
        batch = jax.device_put(batch, trainer.batch_shardings(batch))
        losses = []
        for _ in range(6):
            state, metrics = trainer.train_step(
                state, batch, jax.random.PRNGKey(2)
            )
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # BN running stats untouched, bit for bit
    for before, after in zip(
        jax.tree_util.tree_leaves(stats0),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.batch_stats)
        ),
    ):
        np.testing.assert_array_equal(before, after)
    # ...while params did move
    moved = [
        not np.array_equal(b, np.asarray(a))
        for b, a in zip(
            jax.tree_util.tree_leaves(params0),
            jax.tree_util.tree_leaves(state.params),
        )
    ]
    assert any(moved)


def test_freeze_bn_config_plumbs_through():
    """ExperimentConfig.freeze_bn reaches the Trainer via build_trainer."""
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer

    config = ExperimentConfig(
        model="ssd300_ssd_custom", task="detection", freeze_bn=True,
        model_kwargs={"n_classes": 3},
    )
    trainer, _, _ = build_trainer(config)
    assert trainer.freeze_bn is True
    assert build_trainer(ExperimentConfig(
        model="ssd300_ssd_custom", task="detection",
        model_kwargs={"n_classes": 3},
    ))[0].freeze_bn is False


@pytest.mark.slow
def test_graft_entry_multichip():
    """The driver's dry run: full flagship train step on an 8-device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_in_step_target_encoding(rng):
    """Trainer with target_encoder: raw GT batches produce the same update as
    pre-encoded target batches."""
    import numpy as np
    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder

    enc = TargetEncoder(
        spec=AnchorSpec(img_height=96, img_width=96,
                        scales=(0.2, 0.4, 0.6), steps=None,
                        aspect_ratios=((1.0, 2.0), (1.0, 2.0))),
        predictor_sizes=((4, 4), (2, 2)),
        n_classes=3,
    )
    n_boxes = enc.n_boxes

    class TinyDet(nn.Module):
        @nn.compact
        def __call__(self, inputs, train=False):
            y, cbcr = inputs
            x = nn.relu(nn.Conv(16, (3, 3), name="c")(y))
            x = jnp.mean(x, axis=(1, 2))
            out = nn.Dense(n_boxes * 8, name="h")(x).reshape(
                x.shape[0], n_boxes, 8
            )
            conf = jax.nn.softmax(out[..., :4])
            anchors = jnp.broadcast_to(
                jnp.asarray(enc.anchors)[None], (x.shape[0], n_boxes, 8)
            )
            return jnp.concatenate([conf, out[..., 4:], anchors], -1)

    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    y = rng.normal(0, 1, (2, 12, 12, 16)).astype(np.float32)
    cbcr = rng.normal(0, 1, (2, 6, 6, 32)).astype(np.float32)
    gt = np.zeros((2, 4, 5), np.float32)
    gt[:, 0] = [1, 10, 10, 50, 50]
    mask = np.zeros((2, 4), bool)
    mask[:, 0] = True

    def build(encoder_fn):
        return Trainer(
            model=TinyDet(), loss_fn=detection_loss_fn(l2_scale=0.0),
            optimizer=optax.sgd(1e-2), mesh=mesh, donate=False,
            target_encoder=encoder_fn,
        )

    with mesh:
        t1 = build(enc.encode_fn)
        state1 = t1.init_state(jax.random.PRNGKey(0), (y, cbcr))
        b1 = {"inputs": (y, cbcr), "gt": gt, "gt_mask": mask}
        state1, m1 = t1.train_step(state1, b1, jax.random.PRNGKey(1))

        t2 = build(None)
        state2 = t2.init_state(jax.random.PRNGKey(0), (y, cbcr))
        b2 = {"inputs": (y, cbcr), "targets": np.asarray(enc(gt, mask))}
        state2, m2 = t2.train_step(state2, b2, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_in_step_dct_augment_and_encode(rng):
    """augment_fn (DCT crop/flip + GT rewrite) -> target_encoder -> train step,
    all inside one compiled program."""
    import numpy as np
    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
    from jpeg_detection_resnet_ssd_tpu.ops.dct_detect_augment import (
        make_dct_detection_augment,
    )

    enc = TargetEncoder(
        spec=AnchorSpec(img_height=304, img_width=304,
                        scales=(0.2, 0.4, 0.6), steps=None,
                        aspect_ratios=((1.0, 2.0), (1.0,))),
        predictor_sizes=((4, 4), (2, 2)),
        n_classes=5,
    )
    n_boxes = enc.n_boxes

    class TinyDet(nn.Module):
        @nn.compact
        def __call__(self, inputs, train=False):
            y, cbcr = inputs
            x = nn.relu(nn.Conv(8, (3, 3), name="c")(y))
            x = jnp.mean(x, axis=(1, 2))
            out = nn.Dense(n_boxes * 10, name="h")(x).reshape(
                x.shape[0], n_boxes, 10
            )
            conf = jax.nn.softmax(out[..., :6])
            anchors = jnp.broadcast_to(
                jnp.asarray(enc.anchors)[None], (x.shape[0], n_boxes, 8)
            )
            return jnp.concatenate([conf, out[..., 6:], anchors], -1)

    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    trainer = Trainer(
        model=TinyDet(), loss_fn=detection_loss_fn(l2_scale=0.0),
        optimizer=optax.sgd(1e-2), mesh=mesh, donate=False,
        target_encoder=enc.encode_fn,
        augment_fn=make_dct_detection_augment(38),
    )
    B = 2
    y = rng.normal(0, 50, (B, 44, 44, 64)).astype(np.float32)
    cbcr = rng.normal(0, 20, (B, 22, 22, 128)).astype(np.float32)
    gt = np.zeros((B, 4, 5), np.float32)
    gt[:, 0] = [2, 120, 120, 260, 230]
    mask = np.zeros((B, 4), bool)
    mask[:, 0] = True
    with mesh:
        state = trainer.init_state(
            jax.random.PRNGKey(0),
            (np.zeros((1, 38, 38, 64), np.float32),
             np.zeros((1, 19, 19, 128), np.float32)),
        )
        batch = {"inputs": (y, cbcr), "gt": gt, "gt_mask": mask}
        state, m1 = trainer.train_step(state, batch, jax.random.PRNGKey(1))
        state, m2 = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["total_loss"]))
    # step counter feeds the augment rng: consecutive steps see different
    # crops, so the losses differ
    assert float(m1["total_loss"]) != float(m2["total_loss"])


def test_train_steps_scan_matches_sequential(rng):
    """The fused K-step scan (`Trainer.train_steps`) is step-for-step
    equivalent to K sequential `train_step` calls: same per-step RNG folding
    (dropout + augmentation keyed off state.step), same final params/opt
    state, same per-step losses."""
    mesh = make_mesh()
    K, B = 3, 8

    def make(trainer_cls=Trainer):
        return trainer_cls(
            model=TinyClassifier(),
            loss_fn=classification_loss_fn(),
            optimizer=optax.sgd(0.05, momentum=0.9),
            mesh=mesh,
            donate=False,
        )

    batches = []
    for i in range(K):
        y, cbcr = _toy_batch(np.random.default_rng(100 + i), B)
        labels = np.random.default_rng(200 + i).integers(0, 4, B)
        batches.append({"inputs": (y, cbcr), "labels": labels})

    key = jax.random.PRNGKey(5)
    with mesh:
        trainer = make()
        state_seq = trainer.init_state(
            jax.random.PRNGKey(0), (batches[0]["inputs"][0][:1],
                                    batches[0]["inputs"][1][:1])
        )
        seq_losses = []
        for b in batches:
            b = jax.device_put(b, trainer.batch_shardings(b))
            state_seq, m = trainer.train_step(state_seq, b, key)
            seq_losses.append(float(m["loss"]))

        state_fused = trainer.init_state(
            jax.random.PRNGKey(0), (batches[0]["inputs"][0][:1],
                                    batches[0]["inputs"][1][:1])
        )
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
        stacked = jax.device_put(
            stacked, trainer.stacked_batch_shardings(stacked)
        )
        state_fused, m = trainer.train_steps(state_fused, stacked, key)

    assert int(state_fused.step) == int(state_seq.step) == K
    fused_losses = np.asarray(m["loss"])
    assert fused_losses.shape == (K,)
    np.testing.assert_allclose(fused_losses, seq_losses, rtol=1e-5, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_fused.params),
        jax.tree_util.tree_leaves(state_seq.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_fused.batch_stats),
        jax.tree_util.tree_leaves(state_seq.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_fit_steps_per_call_matches_single(tmp_path, rng):
    """`fit(steps_per_call=K)` trains identically to the sequential loop and
    respects epoch boundaries (groups never straddle them), including a
    leftover partial group at the pipeline tail."""
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import fit

    class FixedPipeline:
        """7 deterministic batches per epoch (odd count: the last one lands
        in a partial pending group when steps_per_call=2)."""

        def __init__(self):
            self.batches = []
            for i in range(7):
                g = np.random.default_rng(1000 + i)
                y, cbcr = _toy_batch(g, 8)
                self.batches.append({
                    "inputs": (y, cbcr),
                    "labels": g.integers(0, 4, 8),
                })

        def __iter__(self):
            return iter(self.batches)

    # steps_per_epoch > len(pipeline): each epoch ends by pipeline
    # exhaustion with one batch stuck in the pending group (7 batches,
    # K=2) — exercises the leftover single-step flush.
    config = ExperimentConfig(
        model="tiny", task="classification", batch_size=8, epochs=2,
        steps_per_epoch=10, learning_rate=0.05, output_dir=str(tmp_path),
    )

    import jpeg_detection_resnet_ssd_tpu.train.loop as loop_mod

    def fake_build_model(name, **kw):
        module = TinyClassifier()
        return module, lambda: (np.zeros((1, 12, 12, 16), np.float32),
                                np.zeros((1, 6, 6, 32), np.float32))

    orig = loop_mod.build_model
    loop_mod.build_model = fake_build_model
    try:
        state1, hist1 = fit(config, FixedPipeline(), log_every=3)
        state2, hist2 = fit(config, FixedPipeline(), log_every=3,
                            steps_per_call=2)
    finally:
        loop_mod.build_model = orig

    # 7 steps in epoch 0 (pipeline exhausts), then 3 in epoch 1 when
    # steps_done hits the global steps_per_epoch boundary (10) — identical
    # step accounting in both modes is part of the contract.
    assert int(state1.step) == int(state2.step) == 10
    np.testing.assert_allclose(
        hist1[-1]["total_loss"], hist2[-1]["total_loss"],
        rtol=1e-5, atol=1e-6,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
