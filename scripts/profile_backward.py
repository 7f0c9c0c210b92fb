"""Segment-wise profile of the flagship model's BACKWARD pass on TPU.

Round-3 state: forward (eval) runs at 74% MFU but fwd+bwd at ~49%, i.e. the
backward pass alone is ~40% MFU — the single largest gap to the >=60% train
MFU target.  This script localizes it by measuring, under the honest chained
slope protocol (see BENCHMARK.md "measurement integrity"), forward and
forward+backward on PREFIXES of `SSDResNetCustom`:

  stage1    : Y branch through conv4_3 tap        (38x38, the FLOP whale)
  stage3    : + 19x19 trunk through conv3_3 tap
  stage4    : + 10x10 trunk through conv4_6 tap
  block5    : + stage 5                            (5x5x2048)
  full      : + neck/extras + SSD heads (the real model)

Diffing successive rows attributes fwd and bwd milliseconds per segment.
Also measured:

  * full fwd+bwd with train=False (BN running stats — isolates the cost of
    batch-stat computation and its backward interaction)
  * full fwd+bwd with a sum() loss instead of the SSD loss (isolates the
    loss<->head backward interaction)

Usage: python scripts/profile_backward.py [--batch 32] [--chain 10]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--trials", type=int, default=3,
                    help="best-of trials per chain (raise under host-CPU "
                         "contention: the slope protocol cancels fixed "
                         "dispatch cost but not random host stalls)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from jpeg_detection_resnet_ssd_tpu.models.ssd import SSDResNetCustom

    B = args.batch
    dtype = jnp.dtype(args.dtype).type

    class PrefixModel(SSDResNetCustom):
        """SSDResNetCustom truncated after a named segment (profiling only).

        Mirrors the parent's __call__ cut at the tap points; any drift from
        the parent shows up as a `full` row that disagrees with the real
        model, which the summary cross-checks.
        """

        stop_at: str = "full"

        @nn.compact
        def __call__(self, inputs, train: bool = False):
            y, cbcr = inputs
            y = jnp.asarray(y, self.dtype)
            cbcr = jnp.asarray(cbcr, self.dtype)
            from jpeg_detection_resnet_ssd_tpu.models.layers import batch_norm

            yb = batch_norm(train, name="bn_y_in", dtype=self.dtype)(y)
            yb = self._conv_block(yb, 1, [256, 256, 384], 1, "a2", train, (1, 1))
            yb = self._identity_block(yb, 2, [256, 256, 384], 1, "b2", train)
            yb = self._identity_block(yb, 3, [256, 256, 384], 1, "c2", train)
            yb = self._conv_block(yb, 3, [128, 128, 384], 2, "a3", train, (1, 1))
            yb = self._identity_block(yb, 3, [128, 128, 384], 2, "b3", train)
            yb = self._identity_block(yb, 3, [128, 128, 384], 2, "c3", train)
            conv4_3 = self._identity_block(yb, 3, [128, 128, 384], 2, "d3", train)
            if self.stop_at == "stage1":
                return conv4_3

            yb = self._conv_block(conv4_3, 3, [256, 256, 384], 2, "a4", train)
            cb = batch_norm(train, name="bn_cbcr_in", dtype=self.dtype)(cbcr)
            cb = self._conv_block(cb, 1, [256, 256, 128], 2, "a5", train, (1, 1))
            x = jnp.concatenate([yb, cb], axis=-1)
            x = self._identity_block(x, 3, [128, 128, 512], 3, "b", train)
            x = self._identity_block(x, 3, [128, 128, 512], 3, "c", train)
            conv3_3 = self._identity_block(x, 3, [128, 128, 512], 3, "d", train)
            if self.stop_at == "stage3":
                return conv3_3

            x = self._conv_block(conv3_3, 3, [256, 256, 1024], 4, "a", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "b", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "c", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "d", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "e", train)
            conv4_6 = self._identity_block(x, 3, [256, 256, 1024], 4, "f", train)
            if self.stop_at == "stage4":
                return conv4_6

            x = self._block5(conv4_6, train)
            if self.stop_at == "block5":
                return x
            raise ValueError(self.stop_at)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 100, (B, 38, 38, 64)), jnp.float32)
    cbcr = jnp.asarray(rng.normal(0, 30, (B, 19, 19, 128)), jnp.float32)

    results = {}

    def record(name, seconds):
        results[name] = seconds * 1e3
        print(json.dumps({"component": name,
                          "ms_per_batch": round(seconds * 1e3, 3)}),
              flush=True)

    def measure(module, tag, train):
        variables = module.init(jax.random.PRNGKey(0), (y[:1], cbcr[:1]),
                                train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        def apply(p, yy):
            kw = dict(train=train)
            v = {"params": p, "batch_stats": batch_stats}
            if train:
                out = module.apply(v, (yy, cbcr), mutable=["batch_stats"],
                                   **kw)[0]
            else:
                out = module.apply(v, (yy, cbcr), **kw)
            return out

        def fwd(c):
            yy, acc = c
            out = apply(params, yy)
            ds = jnp.sum(out).astype(jnp.float32) * 1e-12
            return (yy + ds, acc + ds)

        record(f"{tag}_fwd", chained_seconds(fwd, (y, jnp.float32(0)),
                                             args.chain, trials=args.trials))

        def fwd_bwd(c):
            yy, acc = c

            def loss_of(p):
                out = apply(p, yy)
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-12

            l, grads = jax.value_and_grad(loss_of)(params)
            gsum = sum(jnp.sum(g).astype(jnp.float32)
                       for g in jax.tree_util.tree_leaves(grads))
            return (yy + l * 1e-9 + gsum * 1e-20, acc + l)

        record(f"{tag}_fwd_bwd", chained_seconds(fwd_bwd, (y, jnp.float32(0)),
                                                 args.chain, trials=args.trials))

    for stop in ("stage1", "stage3", "stage4", "block5"):
        measure(PrefixModel(n_classes=20, dtype=dtype, stop_at=stop),
                stop, train=True)

    full = SSDResNetCustom(n_classes=20, dtype=dtype)
    measure(full, "full_train", train=True)
    measure(full, "full_frozen_bn", train=False)
    # remat A/B: rematerialized bottleneck branches trade ~30% extra fwd
    # FLOPs for not storing branch activations — wins iff the backward is
    # HBM-bound on activation reloads.
    measure(SSDResNetCustom(n_classes=20, dtype=dtype, remat=True),
            "full_train_remat", train=True)

    # Segment attribution table
    order = ["stage1", "stage3", "stage4", "block5", "full_train"]
    attribution = {}
    prev_f = prev_b = 0.0
    for seg in order:
        f, b = results[f"{seg}_fwd"], results[f"{seg}_fwd_bwd"]
        attribution[seg] = {
            "fwd_ms": round(f - prev_f, 3),
            "bwd_ms": round((b - f) - (prev_b - prev_f), 3),
        }
        prev_f, prev_b = f, b
    print(json.dumps({"segment_attribution": attribution,
                      "summary_ms": {k: round(v, 3)
                                     for k, v in results.items()}}))


if __name__ == "__main__":
    main()
