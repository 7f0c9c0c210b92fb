"""Benchmark: DCT-SSD300 (ssd_custom) throughput on TPU — all headline paths.

Emits one JSON line per metric (the driver-scored headline is computed
FIRST for robustness to truncation and REPRINTED after every row):

  * matmul_calibration_bf16 — pure 4096^3 matmul TFLOP/s pinning the chip's
    honest achievable peak (the cost-model denominator; true-f32/HIGHEST and
    default-precision behavior are documented in BENCHMARK.md);
  * dct_ssd300_forward_throughput — forward pass only, bf16;
  * dct_ssd300_train_step_throughput — full training step (fwd + SSD loss w/
    hard-negative mining + backward + SGD update + in-step target encode);
  * dct_ssd300_train_augmented_throughput — training step plus the FULL v3
    device augmentation chain (photometric + expand + min-IoU crop + resize
    + flip in coefficient space) — the `--device-augment` production path;
  * dct_ssd300_train_finetune_throughput — the opt-in fine-tune fast path:
    frozen BN (`config.freeze_bn`, the pretrained-backbone recipe — running
    stats pre-converged onto the bench batch, emulating imported pretrained
    statistics) + bf16 momentum trace (`config.momentum_dtype`);
  * packed_pipeline_host_throughput — host-side packed-corpus batch assembly
    (memmap gather + int16 cast), no TPU involved;
  * dct_ssd300_inference_throughput — forward + full decode (softmax,
    per-class threshold, NMS, top-k), the serving path and driver headline;
  * dct_ssd300_inference_int8_throughput — the same serving path with the
    int8-quantized trunk (serve/quantize.py; measured mAP cost 0.002 on a
    trained proxy checkpoint);
  * resnet50_dct_forward_throughput / resnet50_dct_train_step_throughput —
    the classification flagship (ResNet50 deconv DCT stem, batch 256,
    softmax CE + SGD-nesterov), the reference's ImageNet workload.

Methodology (BENCHMARK.md "measurement integrity"): N executions are CHAINED
inside one jitted program via a data dependency and completion is forced by a
host readback.  This environment's TPU relay adds a ~25 ms FIXED round-trip
per dispatch, so every per-iteration number is the SLOPE between a short and
a long chain — (T(4n) - T(n)) / 3n — which cancels the fixed cost exactly;
the slope is the MEDIAN over interleaved sample pairs with physically-
impossible pairs rejected.  The chain length is a DYNAMIC `fori_loop` trip
count, so both chain lengths share ONE compiled executable.

Wall-clock engineering (round 4 — the round-3 driver run died at rc=124):
the relay costs ~30-200 s PER PROGRAM COMPILE but parallelizes concurrent
compiles almost perfectly, so all row programs are AOT-compiled CONCURRENTLY
(ThreadPoolExecutor) after the headline is measured, then timed serially on
a quiet chip.  A wall-clock budget (BENCH_BUDGET_S) bounds the compile
barrier; rows whose compile misses the budget are skipped with an explicit
JSON row, and the headline is reprinted after every row so even a hard kill
parses to the headline metric.

Baseline: the reference never publishes throughput (BASELINE.md).  We bound
the P100 reference at 100 images/sec for inference (SSD300-class Keras/TF-1.8
graphs with in-graph NMS ran at ~40-70 FPS on contemporary P100 reports) and
89 img/s for training (implied by its >48 h single-P100 480k-step schedule,
`README.md:130-131`).  vs_baseline > 1.0 beats the bound; the north-star is
>= 5.0.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FuturesTimeoutError

import numpy as np

P100_INFER_BASELINE = 100.0
P100_TRAIN_BASELINE = 89.0
K80_TRAIN_BASELINE = 50.0
BATCH = 32
CLS_BATCH = 256
CHAIN = 10  # short chain; the long chain is 4x this
TRIALS = 3  # median over physically-consistent interleaved pairs
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1680"))
_T0 = time.monotonic()

# ONE definition of the measurement-critical slope protocol, shared with
# every scripts/profile_*.py (jpeg_detection_resnet_ssd_tpu/utils/timing.py).
from jpeg_detection_resnet_ssd_tpu.utils.timing import (  # noqa: E402
    slope_seconds_dynamic,
)


def _elapsed():
    return time.monotonic() - _T0


def emit(metric, value, unit, vs_baseline=None, **extra):
    row = {"metric": metric, "value": round(value, 2), "unit": unit}
    if vs_baseline is not None:
        row["vs_baseline"] = round(vs_baseline, 3)
    row.update(extra)
    print(json.dumps(row), flush=True)
    return row


def _aot(chained):
    """AOT-compile a jitted fn of one dynamic int32 scalar (chain length)."""
    import jax
    import jax.numpy as jnp

    lowered = chained.lower(jax.ShapeDtypeStruct((), jnp.int32))
    compiled = lowered.compile()
    return lambda n: compiled(np.int32(n))


def _flagship(dtype):
    import jax
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.models import build_model

    module, _ = build_model("ssd300_ssd_custom", n_classes=20, dtype=dtype)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 100, (BATCH, 38, 38, 64)), jnp.float32)
    cbcr = jnp.asarray(rng.normal(0, 30, (BATCH, 19, 19, 128)), jnp.float32)
    variables = module.init(
        jax.random.PRNGKey(0), (y[:1], cbcr[:1]), train=False
    )
    return module, variables, y, cbcr


def _train_setup(img_size=300):
    import jax.numpy as jnp
    import optax

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
    from jpeg_detection_resnet_ssd_tpu.losses import SSDLoss
    from jpeg_detection_resnet_ssd_tpu.models import ssd_predictor_sizes

    encoder = TargetEncoder(
        spec=AnchorSpec(img_height=img_size, img_width=img_size),
        predictor_sizes=ssd_predictor_sizes("resnet_custom"),
        n_classes=20,
    )
    gt = np.zeros((BATCH, 8, 5), np.float32)
    gt[:, 0] = [3, 30, 40, 160, 170]
    gt[:, 1] = [7, 150, 60, 280, 240]
    gt_mask = np.zeros((BATCH, 8), bool)
    gt_mask[:, :2] = True
    return (
        encoder,
        jnp.asarray(gt),
        jnp.asarray(gt_mask),
        SSDLoss(),
        optax.sgd(1e-3, momentum=0.9),
    )


# ---------------------------------------------------------------------------
# Row preparers.  Each returns a list of (sublabel, timed_fn, chain_n,
# reporter) units; `timed_fn(length)` runs a `length`-iteration chain (AOT-
# compiled, dynamic trip count) and `reporter(t_per_iter)` emits the row.
# ---------------------------------------------------------------------------


def prep_matmul():
    import jax
    import jax.numpy as jnp

    k = 4096
    flops = 2 * k**3
    a = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.02, (k, k)), jnp.bfloat16
    )

    @jax.jit
    def chained(length):
        out = jax.lax.fori_loop(0, length, lambda i, c: c @ a, a)
        return jnp.sum(out).astype(jnp.float32)

    def report(t):
        emit("matmul_calibration_bf16", flops / t / 1e12, "TFLOP/s",
             note="achievable chip peak; v5e nominal bf16 is ~197")

    return [("matmul_calibration_bf16", _aot(chained), 50, report)]


def prep_hbm():
    """HBM-bandwidth canary: a large streaming axpy chained under the same
    slope protocol as every other row.  Gives the roofline's BYTES
    denominator a measured value (the FLOPs denominator is prep_matmul) —
    BENCHMARK.md's bandwidth-bound claims divide by THIS number, not the
    v5e's nominal 819 GB/s."""
    import jax
    import jax.numpy as jnp

    n = 1 << 26  # 64M f32 = 256 MiB buffer
    bytes_per_iter = 2 * n * 4  # read carry + write carry

    @jax.jit
    def chained(length):
        # Per iteration the body reads the full carry and writes it back —
        # exactly 8 bytes/element, nothing else.  (An earlier axpy variant
        # with an iota-generated second operand measured an impossible
        # 983 GB/s: XLA fuses iota into the body, so the second "read" was
        # free — the accounting here is deliberately un-fuseable.)  The
        # one-time iota init is outside the loop and cancels in the slope.
        c0 = jnp.arange(n, dtype=jnp.float32) * jnp.float32(1e-8)
        out = jax.lax.fori_loop(
            0, length, lambda i, c: c * jnp.float32(0.9999), c0
        )
        return out[:: 1 << 20].sum().astype(jnp.float32)

    def report(t):
        emit("hbm_bandwidth_calibration", bytes_per_iter / t / 1e9, "GB/s",
             note="streaming scale slope (8 B/elem/iter); v5e nominal 819")

    return [("hbm_bandwidth_calibration", _aot(chained), 10, report)]


def prep_forward(module, variables, y, cbcr):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(length):
        # BOTH inputs are perturbed by the carry — a loop-invariant branch
        # (constant input x constant weights, e.g. the CbCr stem pre-concat)
        # would otherwise be constant-folded out of the measured loop.
        def body(i, acc):
            out = module.apply(variables, (y + acc, cbcr + acc), train=False)
            return jnp.sum(out).astype(jnp.float32) * 1e-12

        return jax.lax.fori_loop(0, length, body, jnp.float32(0.0))

    def report(t):
        emit("dct_ssd300_forward_throughput", BATCH / t, "images/sec/chip",
             vs_baseline=BATCH / t / P100_INFER_BASELINE,
             ms_per_batch=round(t * 1e3, 2))

    return [("dct_ssd300_forward_throughput", _aot(chained), CHAIN, report)]


def prep_train(module, variables, y, cbcr, augmented=False, finetune=False):
    import jax
    import jax.numpy as jnp
    import optax

    encoder, gt, gt_mask, loss_obj, tx = _train_setup()
    params, batch_stats = variables["params"], variables["batch_stats"]
    if finetune:
        # The opt-in fine-tune fast path (BENCHMARK.md "Opt-in training
        # throughput options"): frozen BN + bf16 momentum trace — the
        # pretrained-backbone recipe (the reference's own detection setup,
        # training_dct_pascal_j2d_resnet.py:137-149).  Frozen BN on RANDOM
        # identity statistics diverges on raw ~N(0,100) DCT inputs (round
        # 3's driver run died with a NaN chained loss): production
        # freeze_bn always starts from IMPORTED pretrained statistics, so
        # converge the running stats onto the bench batch first
        # (0.9^50 ~ 5e-3 residual) — the timed chain then measures the
        # production regime AND stays finite.  The chain lr is 1e-5, not
        # 1e-3: without BN's per-layer re-normalization (frozen), 40
        # CHAINED updates on the same batch at fine-tune lr still blow up
        # — the lr scalar changes nothing about the measured computation
        # (identical graph, identical FLOPs), only the iterate's norm.
        tx = optax.sgd(1e-5, momentum=0.9, accumulator_dtype="bfloat16")

        # ONE mutable apply recovers the batch statistics exactly: train-mode
        # BN normalizes by the CURRENT batch stats (running averages never
        # feed forward), so each update moves toward the same fixed point —
        # invert the single momentum step (new = m*init + (1-m)*batch, Keras
        # m=0.99) instead of iterating, saving a second model-sized compile.
        @jax.jit
        def _warm(bs):
            _, mut = module.apply(
                {"params": params, "batch_stats": bs},
                (y, cbcr), train=True, mutable=["batch_stats"],
            )
            m = 0.99
            return jax.tree_util.tree_map(
                lambda new, init: (new - m * init) / (1.0 - m),
                mut["batch_stats"], bs,
            )

        batch_stats = jax.tree_util.tree_map(
            lambda x: x.block_until_ready(), _warm(batch_stats)
        )
    opt_state = tx.init(params)

    aug = None
    y_in, c_in = y, cbcr
    if augmented:
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_detection_augment_v3,
        )

        aug = make_dct_detection_augment_v3(out_y_blocks=38)
        rng = np.random.default_rng(1)
        # oversized 44-block source frame, as shipped by the packed pipeline
        y_in = jnp.asarray(rng.normal(0, 100, (BATCH, 44, 44, 64)),
                           jnp.float32)
        c_in = jnp.asarray(rng.normal(0, 30, (BATCH, 22, 22, 128)),
                           jnp.float32)
        encoder, gt, gt_mask, loss_obj, _ = _train_setup(img_size=304)

    @jax.jit
    def chained(length):
        def body(i, carry):
            p, o, lsum = carry
            if aug is not None:
                batch = {"inputs": (y_in, c_in), "gt": gt,
                         "gt_mask": gt_mask}
                batch = aug(batch, jax.random.fold_in(
                    jax.random.PRNGKey(0), i))
                yy, cc = batch["inputs"]
                tgt = encoder.encode_fn(batch["gt"], batch["gt_mask"])
            else:
                yy, cc = y_in, c_in
                # iteration-dependent sub-pixel jitter: a CONSTANT gt
                # would let XLA hoist the whole in-step encode out of
                # the timed loop (the row's name promises it's inside).
                gt_i = gt.at[..., 1:].add(i.astype(jnp.float32) * 1e-6)
                tgt = encoder.encode_fn(gt_i, gt_mask)

            def loss_of(pp):
                if finetune:
                    out = module.apply(
                        {"params": pp, "batch_stats": batch_stats},
                        (yy, cc), train=False,
                    )
                else:
                    out, _ = module.apply(
                        {"params": pp, "batch_stats": batch_stats},
                        (yy, cc), train=True, mutable=["batch_stats"],
                    )
                return loss_obj(tgt, out.astype(jnp.float32))

            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, o2 = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o2, lsum + loss)

        p_out, _, lsum = jax.lax.fori_loop(
            0, length, body, (params, opt_state, jnp.float32(0.0))
        )
        first = jax.tree_util.tree_leaves(p_out)[0]
        return jnp.sum(first).astype(jnp.float32) + lsum

    name = ("dct_ssd300_train_augmented_throughput" if augmented
            else "dct_ssd300_train_finetune_throughput" if finetune
            else "dct_ssd300_train_step_throughput")

    def report(t):
        emit(name, BATCH / t, "images/sec/chip",
             vs_baseline=BATCH / t / P100_TRAIN_BASELINE,
             ms_per_batch=round(t * 1e3, 2))

    return [(name, _aot(chained), CHAIN, report)]


def prep_inference(module, variables, y, cbcr):
    import jax
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.boxes.anchors import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.models import make_inference_fn

    # Serving opts into the shared candidate pool explicitly (the library
    # default is the reference's literal 'exact' per-class selector).
    decode = make_inference_fn(
        n_classes=20, spec=AnchorSpec(), candidate_selector="shared"
    )

    @jax.jit
    def chained(length):
        def body(i, acc):
            preds = module.apply(variables, (y + acc, cbcr + acc),
                                 train=False)
            out = decode(preds.astype(jnp.float32))
            return jnp.sum(out[:, :, 1]) * 1e-9

        return jax.lax.fori_loop(0, length, body, jnp.float32(0.0))

    def report(t):
        return emit(
            "dct_ssd300_inference_throughput", BATCH / t, "images/sec/chip",
            vs_baseline=BATCH / t / P100_INFER_BASELINE,
            ms_per_batch=round(t * 1e3, 2),
        )

    return [("dct_ssd300_inference_throughput", _aot(chained), CHAIN, report)]


def prep_inference_int8(module, variables, y, cbcr):
    """Serving path with the int8-quantized trunk (serve/quantize.py):
    int8 MXU rate is ~2x bf16; measured mAP cost on a trained proxy
    checkpoint is 0.002 (BENCHMARK.md serving-transforms table)."""
    import jax
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.boxes.anchors import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.models import make_inference_fn
    from jpeg_detection_resnet_ssd_tpu.serve import quantize_for_serving

    qfn, _ = quantize_for_serving(module, variables, [(y, cbcr)])
    decode = make_inference_fn(
        n_classes=20, spec=AnchorSpec(), candidate_selector="shared"
    )

    @jax.jit
    def chained(length):
        def body(i, acc):
            preds = qfn((y + acc, cbcr + acc))
            out = decode(preds.astype(jnp.float32))
            return jnp.sum(out[:, :, 1]) * 1e-9

        return jax.lax.fori_loop(0, length, body, jnp.float32(0.0))

    def report(t):
        emit("dct_ssd300_inference_int8_throughput", BATCH / t,
             "images/sec/chip",
             vs_baseline=BATCH / t / P100_INFER_BASELINE,
             ms_per_batch=round(t * 1e3, 2))

    return [("dct_ssd300_inference_int8_throughput", _aot(chained), CHAIN,
             report)]


def prep_classification():
    """The reference's OTHER headline workload: ImageNet-class ResNet50-DCT
    (deconv stem — its best architecture, `README.md:211`).  Forward and
    full training step (softmax CE + SGD-momentum), batch 256 per chip (the
    reference's GLOBAL batch over 16 K80 ranks fits on one v5e).  Baseline
    bound: ~50 img/s per K80 rank (ResNet50-class Keras/TF-1.8 training
    reports), the per-device denominator of its 4x4-GPU Horovod setup."""
    import jax
    import jax.numpy as jnp
    import optax

    from jpeg_detection_resnet_ssd_tpu.losses import softmax_cross_entropy
    from jpeg_detection_resnet_ssd_tpu.models import build_model

    B = CLS_BATCH
    module, _ = build_model("resnet50_dct_deconv", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 100, (B, 28, 28, 64)), jnp.float32)
    cb = jnp.asarray(rng.normal(0, 30, (B, 14, 14, 64)), jnp.float32)
    cr = jnp.asarray(rng.normal(0, 30, (B, 14, 14, 64)), jnp.float32)
    variables = module.init(
        jax.random.PRNGKey(0), (y[:1], cb[:1], cr[:1]), train=False
    )
    labels = jax.nn.one_hot(jnp.asarray(rng.integers(0, 1000, (B,))), 1000)

    @jax.jit
    def chained_fwd(length):
        # ALL inputs are perturbed by the carry: a loop-invariant branch
        # (constant input x constant weights) would be constant-folded
        # out of the measured loop by XLA (observed on the CPU backend).
        def body(i, acc):
            out = module.apply(variables, (y + acc, cb + acc, cr + acc),
                               train=False)
            return jnp.sum(out).astype(jnp.float32) * 1e-12

        return jax.lax.fori_loop(0, length, body, jnp.float32(0.0))

    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.1, momentum=0.9, nesterov=True)
    opt_state = tx.init(params)

    @jax.jit
    def chained_train(length):
        def body(i, carry):
            p, o, lsum = carry

            def loss_of(pp):
                out, _ = module.apply(
                    {"params": pp, "batch_stats": batch_stats},
                    (y, cb, cr), train=True, mutable=["batch_stats"],
                )
                return jnp.mean(
                    softmax_cross_entropy(out.astype(jnp.float32), labels)
                )

            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, o2 = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o2, lsum + loss)

        p_out, _, lsum = jax.lax.fori_loop(
            0, length, body, (params, opt_state, jnp.float32(0.0))
        )
        first = jax.tree_util.tree_leaves(p_out)[0]
        return jnp.sum(first).astype(jnp.float32) + lsum

    def report_fwd(t):
        emit("resnet50_dct_forward_throughput", B / t, "images/sec/chip",
             ms_per_batch=round(t * 1e3, 2))

    def report_train(t):
        emit("resnet50_dct_train_step_throughput", B / t, "images/sec/chip",
             vs_baseline=B / t / K80_TRAIN_BASELINE,
             ms_per_batch=round(t * 1e3, 2))

    return [
        ("resnet50_dct_forward_throughput", _aot(chained_fwd), CHAIN,
         report_fwd),
        ("resnet50_dct_train_step_throughput", _aot(chained_train), CHAIN,
         report_train),
    ]


def bench_packed_pipeline():
    """Host-side packed-corpus batch assembly (no TPU): memmap gather +
    int16 cast, the per-epoch host work of the --pack-cache path."""
    import tempfile

    from jpeg_detection_resnet_ssd_tpu.data.packed import (
        PackedDctDataset,
        PackedDctPipeline,
    )

    with tempfile.TemporaryDirectory() as td:
        stem = os.path.join(td, "bench_corpus")
        n = 256
        h8 = 44
        rng = np.random.default_rng(0)
        y = (rng.normal(0, 100, (n, h8, h8, 64))).astype(np.int16)
        cbcr = (rng.normal(0, 30, (n, h8 // 2, h8 // 2, 128))).astype(
            np.int16
        )
        np.save(stem + ".y.npy", y)
        np.save(stem + ".cbcr.npy", cbcr)
        gt = np.zeros((n, 8, 5), np.float32)
        gt_mask = np.zeros((n, 8), bool)
        np.savez(stem + ".labels.npz", gt=gt, gt_mask=gt_mask,
                 image_ids=np.asarray([str(i) for i in range(n)]))
        with open(stem + ".meta.json", "w") as f:
            json.dump({"n": n, "img_height": h8 * 8, "img_width": h8 * 8,
                       "max_gt": 8, "quality": 75}, f)
        ds = PackedDctDataset(stem)
        pipe = PackedDctPipeline(ds, BATCH, train=True, seed=0,
                                 ship_dtype="int16")
        for _ in pipe:  # warm the page cache
            pass
        t0 = time.perf_counter()
        epochs = 5
        count = 0
        for _ in range(epochs):
            for batch in pipe:
                count += batch["inputs"][0].shape[0]
        dt = time.perf_counter() - t0
    emit("packed_pipeline_host_throughput", count / dt, "images/sec/host",
         note="memmap gather + int16 cast; no TPU involved")


def main():
    import jax.numpy as jnp

    # Phase 0: flagship init (one compile) + the HEADLINE row, measured
    # serially before anything else so a truncated run still produced it.
    module, variables, y, cbcr = _flagship(jnp.bfloat16)
    (label, fn, n, report), = prep_inference(module, variables, y, cbcr)
    headline = report(slope_seconds_dynamic(fn, n, trials=TRIALS))

    # Phase 1: AOT-compile every other row CONCURRENTLY (the relay
    # parallelizes compiles almost perfectly; serially they cost 30-200 s
    # EACH and round 3's driver run timed out).  prepare() includes any
    # setup executions (finetune BN warm-up, int8 calibration).
    # Submission order puts int8 first (its prepare is the longest serial
    # chain: quantize calibration + executor build + chain compile — it set
    # the round-4 critical path); the timing loop below iterates in THIS
    # list's order, so rows that compile fast are timed first and int8 gets
    # maximum wait headroom at the end.
    # (spec name, exec-time weight, metric names the spec produces, prep);
    # the metric-name list exists so skip/error rows can be emitted under
    # the SAME names successful rows use — a consumer keying on metric
    # names can then associate a skip with its missing metric.
    specs = [
        ("forward", 1, ["dct_ssd300_forward_throughput"],
         lambda: prep_forward(module, variables, y, cbcr)),
        ("train", 1, ["dct_ssd300_train_step_throughput"],
         lambda: prep_train(module, variables, y, cbcr)),
        ("train_finetune", 2, ["dct_ssd300_train_finetune_throughput"],
         lambda: prep_train(module, variables, y, cbcr, finetune=True)),
        ("train_augmented", 1, ["dct_ssd300_train_augmented_throughput"],
         lambda: prep_train(module, variables, y, cbcr, augmented=True)),
        ("classification", 3,
         ["resnet50_dct_forward_throughput",
          "resnet50_dct_train_step_throughput"], prep_classification),
        ("matmul", 1, ["matmul_calibration_bf16"], prep_matmul),
        ("hbm", 1, ["hbm_bandwidth_calibration"], prep_hbm),
        ("inference_int8", 2, ["dct_ssd300_inference_int8_throughput"],
         lambda: prep_inference_int8(module, variables, y, cbcr)),
    ]
    submit_order = ["inference_int8", "forward", "train", "train_finetune",
                    "train_augmented", "classification", "matmul", "hbm"]

    def compile_row(prep):
        t0 = time.monotonic()
        units = prep()
        return units, round(time.monotonic() - t0, 1)

    pool = ThreadPoolExecutor(max_workers=7)
    by_name = {name: prep for name, _, _, prep in specs}
    futures = {name: pool.submit(compile_row, by_name[name])
               for name in submit_order}

    def reprint():
        print(json.dumps(headline), flush=True)

    # Phase 2: FULL barrier on the compile pool (budget-bounded), then time
    # every ready row serially on a quiet chip (~10 s of executions per
    # row).  Timing a row while other compiles are still in flight on the
    # relay server measurably depresses it (forward read 8,829 img/s
    # mid-barrier vs 11,899 on a quiet chip), so no row is timed until the
    # pool is idle or the budget forces a cut.
    exec_reserve = 15.0 * sum(w for _, w, _, _ in specs)
    barrier_deadline = _T0 + BUDGET_S - exec_reserve
    for f in list(futures.values()):
        try:
            f.result(timeout=max(5.0, barrier_deadline - time.monotonic()))
        except Exception:
            pass  # per-row handling below reports timeout/error rows
    for name, weight, metric_names, _ in specs:
        remaining = BUDGET_S - _elapsed()
        wait = max(5.0, remaining - exec_reserve)
        try:
            units, compile_s = futures[name].result(timeout=wait)
        except (TimeoutError, FuturesTimeoutError):
            # builtin TimeoutError aliases concurrent.futures.TimeoutError
            # only on Python >= 3.11; catch both for the 3.10 floor.
            for metric in metric_names:
                print(json.dumps({"metric": metric, "skipped": True,
                                  "reason": f"compile not done within budget "
                                            f"({remaining:.0f}s left)"}),
                      flush=True)
            reprint()
            continue
        except Exception as e:  # pragma: no cover - defensive
            for metric in metric_names:
                print(json.dumps({"metric": metric,
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)
            reprint()
            continue
        for sublabel, fn, n, report in units:
            # A budget-skipped row leaves its compile thread running on the
            # relay; timing while a compile is in flight measurably
            # depresses samples (~26% on forward, see module docstring).
            # Flag such samples so depressed numbers are identifiable.
            in_flight = sorted(
                nm for nm, fut in futures.items() if not fut.done()
            )
            t0 = time.monotonic()
            try:
                t = slope_seconds_dynamic(fn, n, trials=TRIALS)
                report(t)
            except Exception as e:  # pragma: no cover - defensive
                print(json.dumps({"metric": sublabel,
                                  "error": f"{type(e).__name__}: {e}"[:300],
                                  "compile_s": compile_s}),
                      flush=True)
                continue
            telemetry = {"metric": sublabel + "__telemetry",
                         "compile_s": compile_s,
                         "measure_s": round(time.monotonic() - t0, 1),
                         "elapsed_s": round(_elapsed(), 1)}
            if in_flight:
                telemetry["compiles_in_flight"] = in_flight
            print(json.dumps(telemetry), flush=True)
        reprint()

    # Host-only row LAST, on a quiet CPU: running it during the compile
    # barrier depressed it ~3x (tracing threads contend for this box's one
    # CPU; the driver reads throughput, not schedule).
    try:
        bench_packed_pipeline()
    except Exception as e:  # pragma: no cover - defensive
        print(json.dumps({"metric": "packed_pipeline_host_throughput",
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
    reprint()

    print(json.dumps({"metric": "bench_total_s",
                      "value": round(_elapsed(), 1), "unit": "seconds"}),
          flush=True)
    reprint()
    if not all(f.done() for f in futures.values()):
        # A straggler compile thread would block interpreter shutdown (pool
        # threads are joined at exit) — everything is printed, exit hard.
        sys.stdout.flush()
        os._exit(0)
    pool.shutdown(wait=False)
    return headline


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
