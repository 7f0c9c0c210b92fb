"""TPU A/B: XLA filter-vjp vs the Pallas filter-grad kernel.

BENCHMARK.md "Per-conv backward micro-profile" finding (3): XLA's
filter-vjp of the stage-1 3x3 convs with small channel counts runs at
~29% MFU (241 us for 3x3x128x128 on the 38x38 map, vs ~71 us
speed-of-light).  `ops/pallas_conv_grad.py` re-tiles that gradient as
nine [C, BHW] x [BHW, K] matmuls with a VMEM-resident accumulator.

This script, on the real chip:
  1. asserts the Pallas kernel's dW matches XLA's vjp (compiled, not
     interpret mode — this is the first Mosaic compilation check);
  2. times XLA's filter-vjp vs the kernel for every 3x3 stride-1 SAME
     shape in the flagship, under the chained slope protocol;
  3. times the full fwd+bwd of a conv via `conv3x3_same_pallas_wgrad`
     vs the plain XLA conv.

Usage: python scripts/profile_pallas_wgrad.py [--batch 32] [--chain 10]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jpeg_detection_resnet_ssd_tpu.utils.timing import chained_seconds

PEAK_TFLOPS = 192.7


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the compiled exactness check (already "
                         "verified in an earlier run)")
    ap.add_argument("--only", default=None,
                    help="comma-separated substring filter on shape names "
                         "(e.g. '38x38_128'): time only matching shapes — "
                         "useful on a slow relay where each compile costs "
                         "minutes")
    ap.add_argument("--wgrad-only", action="store_true",
                    help="skip the full fwd+bwd arms, time only the "
                         "filter-grad A/B")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.ops.pallas_conv_grad import (
        conv3x3_filter_grad,
        conv3x3_same_pallas_wgrad,
    )

    B = args.batch
    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # ---- 1. compiled exactness check ------------------------------------
    if args.skip_check:
        print(json.dumps({"check": "skipped (--skip-check)"}), flush=True)
        return _timings(args)
    x = jnp.asarray(rng.normal(0, 1, (4, 38, 38, 128)), bf16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 128, 128)), bf16)
    ct = jnp.asarray(rng.normal(0, 1, (4, 38, 38, 128)), bf16)
    _, vjp = jax.vjp(lambda ww: xla_conv(x, ww), w)
    (dw_ref,) = vjp(ct)
    dw_got = conv3x3_filter_grad(x, ct)
    err = float(jnp.max(jnp.abs(dw_got - dw_ref.astype(jnp.float32)))
                / (jnp.max(jnp.abs(dw_ref.astype(jnp.float32))) + 1e-9))
    print(json.dumps({"check": "pallas_wgrad_compiled_vs_xla",
                      "rel_err": round(err, 6), "ok": err < 5e-3}),
          flush=True)
    if err >= 5e-3:
        print(json.dumps({"fatal": "kernel does not match XLA on device"}),
              flush=True)
        return
    return _timings(args)


def _timings(args):
    import jax
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.ops.pallas_conv_grad import (
        conv3x3_filter_grad,
        conv3x3_filter_grad_xla_dots,
        conv3x3_same_pallas_wgrad,
    )

    B = args.batch
    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # ---- 2/3. per-shape timings -----------------------------------------
    # Every 3x3 stride-1 SAME conv shape in the flagship (hw, cin, cout)
    # plus the classification stage-1 analog at 28x28.
    shapes = [
        (38, 256, 256),   # stage-1 c2 middle
        (38, 128, 128),   # stage-1 b3/c3/d3 middles (the whale, x3 per step)
        (19, 256, 256),   # stage-3 middles at SSD scale
        (19, 512, 102),   # 19x19 conf head (fused head is 84+16=100 -> pad)
        (10, 256, 256),   # stage-4 middles
        (38, 384, 100),   # 38x38 fused conf+loc head
    ]

    only = [s for s in (args.only or "").split(",") if s]
    for hw, cin, cout in shapes:
        if only and not any(
            f in f"3x3_{hw}x{hw}_{cin}_{cout}" for f in only
        ):
            continue
        x = jnp.asarray(rng.normal(0, 1, (B, hw, hw, cin)), bf16)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), bf16)
        ct_shape = jax.eval_shape(xla_conv, x, w)
        ct = jnp.asarray(rng.normal(0, 1, ct_shape.shape), bf16)
        flops = 2.0 * B * hw * hw * 9 * cin * cout
        name = f"3x3_{hw}x{hw}_{cin}_{cout}"

        def xla_wgrad_step(c, x=x, w=w):
            cc, acc = c
            _, vjp = jax.vjp(lambda ww: xla_conv(x, ww), w)
            (gw,) = vjp(cc)
            d = jnp.sum(gw).astype(jnp.float32) * 1e-12
            return (cc + d.astype(bf16), acc + d)

        def pallas_wgrad_step(c, x=x):
            cc, acc = c
            gw = conv3x3_filter_grad(x, cc)
            d = jnp.sum(gw) * 1e-12
            return (cc + d.astype(bf16), acc + d)

        def dots_wgrad_step(c, x=x):
            cc, acc = c
            gw = conv3x3_filter_grad_xla_dots(x, cc)
            d = jnp.sum(gw) * 1e-12
            return (cc + d.astype(bf16), acc + d)

        for tag, step in (("xla", xla_wgrad_step),
                          ("dots", dots_wgrad_step),
                          ("pallas", pallas_wgrad_step)):
            s = chained_seconds(step, (ct, jnp.float32(0)), args.chain,
                                trials=args.trials)
            print(json.dumps({
                "op": name, "pass": f"wgrad_{tag}",
                "us": round(s * 1e6, 1),
                "mfu": round(flops / s / (PEAK_TFLOPS * 1e12), 3),
            }), flush=True)

        if args.wgrad_only:
            continue

        # full fwd+bwd via custom_vjp vs plain XLA
        def full_step(conv, c, x=x, w=w):
            cc, acc = c
            def loss(xx, ww):
                return jnp.sum(conv(xx, ww).astype(jnp.float32) * 1e-12)
            # perturb the conv input by the carry so no iteration hoists
            xp = x + (jnp.sum(cc) * 1e-30).astype(bf16)
            (dx, dw) = jax.grad(loss, argnums=(0, 1))(xp, w)
            d = jnp.sum(dw).astype(jnp.float32) * 1e-12
            return (cc + d.astype(bf16), acc + d)

        flops3 = flops * 3  # fwd + input-grad + filter-grad
        for tag, conv in (("xla", xla_conv),
                          ("pallas", lambda a, b:
                           conv3x3_same_pallas_wgrad(a, b))):
            s = chained_seconds(
                lambda c, conv=conv: full_step(conv, c),
                (ct, jnp.float32(0)), args.chain, trials=args.trials)
            print(json.dumps({
                "op": name, "pass": f"fwd_bwd_{tag}",
                "us": round(s * 1e6, 1),
                "mfu": round(flops3 / s / (PEAK_TFLOPS * 1e12), 3),
            }), flush=True)


if __name__ == "__main__":
    main()
