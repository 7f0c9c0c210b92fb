"""SUSTAINED end-to-end training throughput: single steps vs fused K-step scan.

The honest chained-slope numbers in BENCHMARK.md measure pure device time;
this script measures the other thing that matters in production — the
sustained wall-clock rate of the real host loop (pipeline batch assembly +
host->device transfer + dispatch + step), which in this environment is
dominated by the TPU relay's ~25 ms fixed round-trip per dispatch
(BENCHMARK.md "measurement integrity": round-2 sustained training measured
157 img/s, transfer/dispatch-bound, vs ~2,200 img/s device-bound).

`Trainer.train_steps` (steps_per_call > 1) fuses K optimization steps into
one compiled `lax.scan`, pre-staging K batches in one transfer, so the fixed
dispatch cost is paid once per K steps.  This script times the production
loop body at K in {1, 8, 32} on the flagship detection step (in-step target
encoding, packed-corpus host pipeline) and prints one JSON row per K.

Usage: python scripts/profile_sustained.py [--steps 64] [--batch 32]

Note: `--platform cpu` is a correctness smoke-test only — XLA:CPU executes
the scanned train-step body pathologically slowly (~12x the eager step on
this 1-core VM, compile excluded), so CPU throughput numbers here mean
nothing.  On TPU the scanned body runs at the same per-step device time as
the eager step (bench.py's chained-timing protocol is itself a scan over
the train body and matches the XLA cost model).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=64,
                    help="timed steps per K (after a compile warmup)")
    ap.add_argument("--ks", default="1,8,32")
    ap.add_argument("--platform", default=None,
                    help="e.g. 'cpu' to smoke-test off-TPU")
    ap.add_argument("--no-canary", action="store_true")
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        ssd_predictor_sizes,
    )
    from jpeg_detection_resnet_ssd_tpu.parallel import make_mesh
    from jpeg_detection_resnet_ssd_tpu.train import Trainer, detection_loss_fn

    B = args.batch
    rng = np.random.default_rng(0)

    if not args.no_canary:
        # matmul canary: same-process chip health (chips from the pool vary)
        k = 4096
        a = jnp.asarray(rng.normal(0, 0.02, (k, k)), jnp.bfloat16)

        @jax.jit
        def canary():
            def body(c, _):
                return c @ a, None

            out, _ = jax.lax.scan(body, a, None, length=30)
            return jnp.sum(out).astype(jnp.float32)

        float(canary())
        t0 = time.perf_counter()
        float(canary())
        canary_tf = 30 * 2 * k**3 / (time.perf_counter() - t0) / 1e12
        print(json.dumps({"component": "matmul_canary_single_chain",
                          "TFLOPs": round(canary_tf, 1),
                          "note": "includes fixed dispatch cost; ceiling is "
                                  "~192.7 by slope"}), flush=True)

    module, _ = build_model("ssd300_ssd_custom", n_classes=20,
                            dtype=jnp.bfloat16)
    encoder = TargetEncoder(
        spec=AnchorSpec(),
        predictor_sizes=ssd_predictor_sizes("resnet_custom"),
        n_classes=20,
    )
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    trainer = Trainer(
        model=module,
        loss_fn=detection_loss_fn(),
        optimizer=optax.sgd(1e-3, momentum=0.9),
        mesh=mesh,
        target_encoder=encoder.encode_fn,
        donate=True,
    )

    # host batches, exactly what the packed pipeline ships (int16 coeffs,
    # padded GT) — host-side assembly cost is part of what we time.
    def make_batch(i):
        g = np.random.default_rng(i)
        y = g.normal(0, 100, (B, 38, 38, 64)).astype(np.int16)
        cbcr = g.normal(0, 30, (B, 19, 19, 128)).astype(np.int16)
        gt = np.zeros((B, 8, 5), np.float32)
        gt[:, 0] = [3, 30, 40, 160, 170]
        gt[:, 1] = [7, 150, 60, 280, 240]
        gt_mask = np.zeros((B, 8), bool)
        gt_mask[:, :2] = True
        return {"inputs": (y, cbcr), "gt": gt, "gt_mask": gt_mask}

    host_batches = [make_batch(i) for i in range(max(ks))]

    def cast(b):
        y, c = b["inputs"]
        return dict(b, inputs=(y.astype(np.float32), c.astype(np.float32)))

    results = []
    with mesh:
        for K in ks:
            state = trainer.init_state(
                jax.random.PRNGKey(0),
                (np.zeros((1, 38, 38, 64), np.float32),
                 np.zeros((1, 19, 19, 128), np.float32)),
            )
            key = jax.random.PRNGKey(1)

            def run_group(state, group):
                if len(group) == 1:
                    b = jax.device_put(
                        cast(group[0]), trainer.batch_shardings(cast(group[0]))
                    )
                    return trainer.train_step(state, b, key)
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *[cast(g) for g in group]
                )
                stacked = jax.device_put(
                    stacked, trainer.stacked_batch_shardings(stacked)
                )
                return trainer.train_steps(state, stacked, key)

            # compile warmup, TWICE: the first call's output state can carry
            # different layouts/shardings than the freshly-initialized input
            # (donation), so call #2 may recompile — keep both out of the
            # timed region.
            for _ in range(2):
                state, m = run_group(state, host_batches[:K])
                float(np.asarray(m["total_loss"]).ravel()[-1])

            n_groups = max(args.steps // K, 2)
            t0 = time.perf_counter()
            for g in range(n_groups):
                state, m = run_group(state, host_batches[:K])
            # force completion with a host readback of the last loss
            last = float(np.asarray(m["total_loss"]).ravel()[-1])
            dt = time.perf_counter() - t0
            steps = n_groups * K
            row = {
                "component": "sustained_train_step",
                "steps_per_call": K,
                "timed_steps": steps,
                "img_per_s_sustained": round(steps * B / dt, 1),
                "ms_per_step_sustained": round(dt / steps * 1e3, 2),
                "final_loss": round(last, 3),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    if len(results) >= 2:
        base = results[0]["img_per_s_sustained"]
        best = max(r["img_per_s_sustained"] for r in results)
        print(json.dumps({
            "component": "sustained_speedup",
            "best_vs_single": round(best / base, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
