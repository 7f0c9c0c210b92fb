"""Batch-size scaling of the flagship bf16 train step and forward pass.

The round-3 profile showed fwd+bwd at ~49% MFU at batch 32 — conv backward
(weight gradients contract over batch*spatial) is the piece that benefits
most from a larger batch, so this script measures the production train step
(fwd + SSD loss + backward + SGD + in-step encode) and the eval forward at
several batch sizes under the honest chained protocol (BENCHMARK.md
"measurement integrity": chained executions in one jit, host readback,
slope between two chain lengths; a 4096^3 bf16 matmul canary pins the
same-process chip ceiling so MFU is computed against what THIS chip
actually achieves, not a datasheet number).

FLOPs per program are taken from XLA's own cost analysis of the compiled
single-step program, so the MFU numerator is exact for each batch size.

Usage: python scripts/profile_batch_scaling.py [--batches 32,64,128]
       [--chain 10]
Prints one JSON object per measurement and a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.profile_train_step import chained_seconds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128")
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp
    import optax

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
    from jpeg_detection_resnet_ssd_tpu.losses import SSDLoss
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        ssd_predictor_sizes,
    )

    results = []

    def record(name, B, seconds, flops):
        row = {
            "component": name,
            "batch": B,
            "ms_per_batch": round(seconds * 1e3, 3),
            "img_per_s": round(B / seconds, 1),
            "tflops": round(flops / seconds / 1e12, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # Same-process chip ceiling (the chip pool hands out differently-loaded
    # chips; only interleaved same-process comparisons are valid).
    k = 4096
    a = jnp.asarray(np.random.default_rng(0).normal(0, 0.02, (k, k)),
                    jnp.bfloat16)

    def canary(c):
        return (c @ a) * (1.0 / k)

    t = chained_seconds(canary, a, 50)
    peak = 2 * k**3 / t / 1e12
    print(json.dumps({"component": "matmul_canary_bf16",
                      "tflops": round(peak, 1)}), flush=True)

    module, _ = build_model("ssd300_ssd_custom", n_classes=20,
                            dtype=jnp.bfloat16)
    encoder = TargetEncoder(
        spec=AnchorSpec(),
        predictor_sizes=ssd_predictor_sizes("resnet_custom"),
        n_classes=20,
    )
    loss_obj = SSDLoss()
    tx = optax.sgd(1e-3, momentum=0.9)
    rng = np.random.default_rng(0)

    for B in batches:
        y = jnp.asarray(rng.normal(0, 100, (B, 38, 38, 64)), jnp.float32)
        cbcr = jnp.asarray(rng.normal(0, 30, (B, 19, 19, 128)), jnp.float32)
        variables = module.init(jax.random.PRNGKey(0), (y[:1], cbcr[:1]),
                                train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]
        opt_state = tx.init(params)
        gt = np.zeros((B, 8, 5), np.float32)
        gt[:, 0] = [3, 30, 40, 160, 170]
        gt[:, 1] = [7, 150, 60, 280, 240]
        gt_mask = np.zeros((B, 8), bool)
        gt_mask[:, :2] = True
        gt, gt_mask = jnp.asarray(gt), jnp.asarray(gt_mask)

        # forward (eval mode)
        def fwd_step(c):
            out = module.apply(variables, (c, cbcr), train=False)
            return c + jnp.sum(out).astype(jnp.float32) * 1e-12

        fwd_flops = (
            jax.jit(fwd_step).lower(y).compile().cost_analysis()["flops"]
        )
        record("forward_eval", B, chained_seconds(fwd_step, y, args.chain),
               fwd_flops)

        # production train step (in-step encode included).  The GT is
        # jittered by a param-dependent epsilon: a CONSTANT gt would let
        # XLA hoist the whole encode out of the timed scan.
        def train_step(carry):
            p, o = carry
            eps = (
                jax.tree_util.tree_leaves(p)[0].ravel()[0].astype(jnp.float32)
                * 1e-9
            )
            tgt = encoder.encode_fn(gt.at[:, :, 1:].add(eps), gt_mask)

            def loss_of(pp):
                out, _ = module.apply(
                    {"params": pp, "batch_stats": batch_stats},
                    (y, cbcr), train=True, mutable=["batch_stats"],
                )
                return loss_obj(tgt, out.astype(jnp.float32))

            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, o2 = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o2)

        step_flops = (
            jax.jit(train_step)
            .lower((params, opt_state))
            .compile()
            .cost_analysis()["flops"]
        )
        record(
            "train_step_with_encode", B,
            chained_seconds(train_step, (params, opt_state), args.chain),
            step_flops,
        )

    print(json.dumps({
        "summary": results,
        "canary_tflops": round(peak, 1),
        "mfu_vs_canary": {
            f"{r['component']}_b{r['batch']}": round(r["tflops"] / peak, 3)
            for r in results
        },
    }))


if __name__ == "__main__":
    main()
