"""Component-wise profile of the flagship bf16 detection train step on TPU.

Measures, under the honest chained protocol (BENCHMARK.md "measurement
integrity": N executions chained in ONE jit via a data dependency, completion
forced by host readback), the cost of each piece of the compiled training
program to locate the non-MXU tail that holds bf16 MFU below the chip peak:

  * full train step (fwd + SSD loss + backward + SGD update [+ encode/augment])
  * forward only (train mode, BN mutation)
  * value_and_grad without the optimizer update
  * SSD loss alone on fixed tensors (isolates the hard-negative argsort)
  * in-step target encoder alone
  * device augmentation chain alone
  * SGD update alone (optimizer memory traffic)

Usage: python scripts/profile_train_step.py [--batch 32] [--chain 10]
Prints one JSON object per measurement and a summary.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import numpy as np


# ONE definition of the measurement-critical protocol, shared with bench.py
# and the other profile scripts (re-exported here for their imports).
from jpeg_detection_resnet_ssd_tpu.utils.timing import (  # noqa: E402
    chained_seconds,
    slope_seconds,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--augment", action="store_true",
                    help="include the device augmentation chain variants")
    ap.add_argument("--pallas-wgrad", action="store_true",
                    help="route eligible 3x3 convs through the Pallas "
                         "filter-grad kernel (A/B against a run without "
                         "this flag, same process not required: the flag "
                         "only changes the backward)")
    ap.add_argument("--freeze-bn", action="store_true",
                    help="apply the model with BatchNorm frozen "
                         "(config.freeze_bn): eval-mode normalization, no "
                         "batch_stats mutation — measures the BN share of "
                         "the step (expected ~1.5 ms on the flagship)")
    ap.add_argument("--momentum-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="SGD momentum accumulator dtype "
                         "(config.momentum_dtype): bfloat16 halves the "
                         "trace's HBM read+write traffic in the optimizer "
                         "update — A/B the train_step / sgd_update_only rows")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
    from jpeg_detection_resnet_ssd_tpu.losses import SSDLoss
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        ssd_predictor_sizes,
    )

    B = args.batch
    dtype = jnp.dtype(args.dtype).type
    if args.pallas_wgrad:
        from jpeg_detection_resnet_ssd_tpu.models import layers

        layers.set_pallas_wgrad(True)
    module, _ = build_model("ssd300_ssd_custom", n_classes=20, dtype=dtype)
    rng = np.random.default_rng(0)
    # Under --freeze-bn the init-state BN is an identity map (running
    # mean 0 / var 1), so coefficient-scale inputs overflow bf16 through
    # the unnormalized trunk; unit-scale inputs keep every activation
    # finite and the timing is scale-independent.
    in_scale = 0.01 if args.freeze_bn else 1.0
    y = jnp.asarray(rng.normal(0, 100 * in_scale, (B, 38, 38, 64)),
                    jnp.float32)
    cbcr = jnp.asarray(rng.normal(0, 30 * in_scale, (B, 19, 19, 128)),
                       jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), (y[:1], cbcr[:1]),
                            train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    encoder = TargetEncoder(
        spec=AnchorSpec(),
        predictor_sizes=ssd_predictor_sizes("resnet_custom"),
        n_classes=20,
    )
    gt = np.zeros((B, 8, 5), np.float32)
    gt[:, 0] = [3, 30, 40, 160, 170]
    gt[:, 1] = [7, 150, 60, 280, 240]
    gt_mask = np.zeros((B, 8), bool)
    gt_mask[:, :2] = True
    gt = jnp.asarray(gt)
    gt_mask = jnp.asarray(gt_mask)
    targets = encoder.encode_fn(gt, gt_mask)

    loss_obj = SSDLoss()
    acc_dtype = (None if args.momentum_dtype == "float32"
                 else args.momentum_dtype)
    # Under --freeze-bn a random-init model diverges (identity BN), so a
    # chained sequence of real updates at lr 1e-3 overflows; a tiny lr
    # keeps the chain finite and the update cost is lr-independent.
    lr = 1e-9 if args.freeze_bn else 1e-3
    tx = optax.sgd(lr, momentum=0.9, accumulator_dtype=acc_dtype)
    opt_state = tx.init(params)

    def apply_train(pp, inputs):
        """Model forward in the profiled training mode (honors --freeze-bn)."""
        if args.freeze_bn:
            return module.apply(
                {"params": pp, "batch_stats": batch_stats}, inputs,
                train=False,
            )
        out, _ = module.apply(
            {"params": pp, "batch_stats": batch_stats}, inputs,
            train=True, mutable=["batch_stats"],
        )
        return out

    results = {}

    def record(name, seconds):
        results[name] = seconds * 1e3
        print(json.dumps({"component": name, "ms_per_batch":
                          round(seconds * 1e3, 3),
                          "img_per_s": round(B / seconds, 1)}), flush=True)

    # 1) forward only, train mode (BN mutation like the real step)
    def fwd(c):
        yy, _ = c
        out = apply_train(params, (yy, cbcr))
        ds = jnp.sum(out).astype(jnp.float32) * 1e-12
        return (yy + ds, ds)

    record("forward_train_mode", chained_seconds(fwd, (y, jnp.float32(0)),
                                                 args.chain))

    # 2) forward + loss + grad (no optimizer)
    def fwd_bwd(c):
        yy, _ = c

        def loss_of(p):
            out = apply_train(p, (yy, cbcr))
            return loss_obj(targets, out.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_of)(params)
        gsum = sum(jnp.sum(g).astype(jnp.float32)
                   for g in jax.tree_util.tree_leaves(grads))
        return (yy + loss * 1e-9 + gsum * 1e-20, loss)

    record("forward_backward_loss",
           chained_seconds(fwd_bwd, (y, jnp.float32(0)), args.chain))

    # 3) full train step (grads + SGD update), donating nothing (carry keeps
    # params so the chain is a true sequential dependency)
    def full_step(c):
        p, o, yy = c

        def loss_of(pp):
            out = apply_train(pp, (yy, cbcr))
            return loss_obj(targets, out.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_of)(p)
        updates, o2 = tx.update(grads, o, p)
        p2 = optax.apply_updates(p, updates)
        return (p2, o2, yy + loss * 1e-9)

    record("train_step", chained_seconds(
        full_step, (params, opt_state, y), args.chain))

    # 3b) full train step + in-step encode
    def full_step_encode(c):
        p, o, yy = c
        tgt = encoder.encode_fn(gt, gt_mask)

        def loss_of(pp):
            out = apply_train(pp, (yy, cbcr))
            return loss_obj(tgt, out.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_of)(p)
        updates, o2 = tx.update(grads, o, p)
        p2 = optax.apply_updates(p, updates)
        return (p2, o2, yy + loss * 1e-9)

    record("train_step_with_encode", chained_seconds(
        full_step_encode, (params, opt_state, y), args.chain))

    # 4) SSD loss alone (the hard-negative argsort candidate)
    preds = module.apply({"params": params, "batch_stats": batch_stats},
                         (y, cbcr), train=False).astype(jnp.float32)

    def loss_only(c):
        t, acc = c
        l = loss_obj(t, preds + acc * 1e-9)
        return (t, acc + l * 1e-6)

    record("ssd_loss_only", chained_seconds(
        loss_only, (targets, jnp.float32(0)), args.chain * 4))

    # 4b) SSD loss gradient alone
    def loss_grad_only(c):
        t, acc = c
        g = jax.grad(lambda pr: loss_obj(t, pr))(preds + acc * 1e-9)
        return (t, acc + jnp.sum(g).astype(jnp.float32) * 1e-6)

    record("ssd_loss_grad_only", chained_seconds(
        loss_grad_only, (targets, jnp.float32(0)), args.chain * 4))

    # 5) target encoder alone
    def encode_only(c):
        g, acc = c
        t = encoder.encode_fn(g, gt_mask)
        # nonzero factor: a literal *0 could be algebraically folded, making
        # the encoder loop-invariant and hoisted out of the timing scan
        return (g + acc * 1e-20, acc + jnp.sum(t).astype(jnp.float32) * 1e-9)

    record("target_encode_only", chained_seconds(
        encode_only, (gt, jnp.float32(0)), args.chain * 4))

    # 6) SGD update alone (optimizer memory traffic)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-6, params)

    def sgd_only(c):
        p, o = c
        updates, o2 = tx.update(grads, o, p)
        return (optax.apply_updates(p, updates), o2)

    record("sgd_update_only", chained_seconds(
        sgd_only, (params, opt_state), args.chain * 4))

    # 6b) same update with the OTHER momentum accumulator dtype, measured
    # in-process so the pair is a true same-chip A/B (the accumulator is
    # half the optimizer's HBM read+write traffic; config.momentum_dtype)
    other = "bfloat16" if args.momentum_dtype == "float32" else "float32"
    tx_other = optax.sgd(1e-3, momentum=0.9,
                         accumulator_dtype=None if other == "float32"
                         else other)
    opt_state_other = tx_other.init(params)

    def sgd_only_other(c):
        p, o = c
        updates, o2 = tx_other.update(grads, o, p)
        return (optax.apply_updates(p, updates), o2)

    record(f"sgd_update_only_{other}_momentum", chained_seconds(
        sgd_only_other, (params, opt_state_other), args.chain * 4))

    # 7) device augmentation chain alone (optional)
    if args.augment:
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_detection_augment_v3,
        )

        aug = make_dct_detection_augment_v3(out_y_blocks=38)
        y44 = jnp.asarray(rng.normal(0, 100, (B, 44, 44, 64)), jnp.float32)
        c22 = jnp.asarray(rng.normal(0, 30, (B, 22, 22, 128)), jnp.float32)

        def aug_only(c):
            yy, acc = c
            batch = {"inputs": (yy, c22), "gt": gt, "gt_mask": gt_mask}
            out = aug(batch, jax.random.fold_in(jax.random.PRNGKey(0),
                                                acc.astype(jnp.int32)))
            oy, ocb = out["inputs"]
            return (yy, acc + jnp.sum(oy).astype(jnp.float32) * 1e-9)

        record("device_augment_only", chained_seconds(
            aug_only, (y44, jnp.float32(0)), args.chain * 2))

        # exact pixel-space HSV photometric variant (--photometric pixel):
        # adds IDCT->chain->DCT; the delta vs the row above is its price
        aug_px = make_dct_detection_augment_v3(out_y_blocks=38,
                                               photometric="pixel_hsv")

        def aug_px_only(c):
            yy, acc = c
            batch = {"inputs": (yy, c22), "gt": gt, "gt_mask": gt_mask}
            out = aug_px(batch, jax.random.fold_in(jax.random.PRNGKey(0),
                                                   acc.astype(jnp.int32)))
            oy, ocb = out["inputs"]
            return (yy, acc + jnp.sum(oy).astype(jnp.float32) * 1e-9)

        record("device_augment_pixel_hsv", chained_seconds(
            aug_px_only, (y44, jnp.float32(0)), args.chain * 2))

    print(json.dumps({"summary_ms": {k: round(v, 3)
                                     for k, v in results.items()}}))


if __name__ == "__main__":
    main()
