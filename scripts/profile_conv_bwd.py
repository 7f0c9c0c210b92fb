"""Per-conv micro-profile of the flagship backward pass on TPU.

BENCHMARK.md "Backward-pass segment attribution" localizes the train-MFU
gap to (a) the 38x38 stage-1 branch (47% bwd MFU) and (b) the SSD
neck/extras/heads (31% bwd MFU).  This script drills one level deeper:
for every DISTINCT conv shape in those segments it times, under the
chained slope protocol,

  * fwd        : the conv alone
  * bwd_input  : vjp wrt the conv input
  * bwd_filter : vjp wrt the filter

and computes per-op MFU against the 192.7 TF/s measured bf16 ceiling.
It also times candidate reformulations:

  * 1x1 convs re-expressed as reshape+dot_general (fwd and both vjps)
  * fc6 (3x3 dilation-6 SAME on a 5x5 map): the dilated taps at +-6 are
    ALWAYS out of bounds on a 5x5 input, so the conv is exactly the
    center-tap 1x1 conv at 1/9 the FLOPs — timed against the dilated
    original (exactness asserted numerically first)
  * per-source conf(3x3,Cout=4*(classes+1)) + loc(3x3,Cout=4*4) head
    pair vs ONE fused conv with Cout=conf+loc (lane-padding: two pads to
    128 vs one)

Usage: python scripts/profile_conv_bwd.py [--batch 32] [--chain 10]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B = args.batch
    bf16 = jnp.bfloat16

    def conv_fn(k, cin, cout, stride=1, padding="SAME", dilation=1):
        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), padding,
                rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return f

    rng = np.random.default_rng(0)

    def measure(name, f, x, w, flops):
        """Time f(x, w), d/dx, d/dw under the chained protocol."""
        x = jnp.asarray(x, bf16)
        w = jnp.asarray(w, bf16)

        out = jax.eval_shape(f, x, w)
        ct = jnp.asarray(rng.normal(0, 1, out.shape), bf16)

        def fwd_step(c):
            xx, acc = c
            o = f(xx, w)
            d = jnp.sum(o).astype(jnp.float32) * 1e-12
            return (xx + d.astype(bf16), acc + d)

        def bwd_in_step(c):
            cc, acc = c
            _, vjp = jax.vjp(lambda xx: f(xx, w), x)
            (gx,) = vjp(cc)
            d = jnp.sum(gx).astype(jnp.float32) * 1e-12
            return (cc + d.astype(bf16), acc + d)

        def bwd_filt_step(c):
            cc, acc = c
            _, vjp = jax.vjp(lambda ww: f(x, ww), w)
            (gw,) = vjp(cc)
            d = jnp.sum(gw).astype(jnp.float32) * 1e-12
            return (cc + d.astype(bf16), acc + d)

        for tag, step, carry in (
            ("fwd", fwd_step, (x, jnp.float32(0))),
            ("bwd_input", bwd_in_step, (ct, jnp.float32(0))),
            ("bwd_filter", bwd_filt_step, (ct, jnp.float32(0))),
        ):
            s = chained_seconds(step, carry, args.chain, trials=args.trials)
            mfu = flops / s / (PEAK_TFLOPS * 1e12)
            print(json.dumps({
                "op": name, "pass": tag, "us": round(s * 1e6, 1),
                "gflop": round(flops / 1e9, 2), "mfu": round(mfu, 3),
            }), flush=True)

    def conv_case(name, hw, k, cin, cout, stride=1, padding="SAME",
                  dilation=1, out_hw=None):
        x = rng.normal(0, 1, (B, hw, hw, cin))
        w = rng.normal(0, 0.05, (k, k, cin, cout))
        o = out_hw if out_hw is not None else (hw + stride - 1) // stride
        flops = 2.0 * B * o * o * k * k * cin * cout
        measure(name, conv_fn(k, cin, cout, stride, padding, dilation),
                x, w, flops)
        return x, w

    # ---- stage 1 (38x38) distinct shapes -------------------------------
    conv_case("s1_1x1_64_256", 38, 1, 64, 256)
    conv_case("s1_1x1_256_256", 38, 1, 256, 256)
    conv_case("s1_1x1_256_384", 38, 1, 256, 384)
    conv_case("s1_1x1_64_384", 38, 1, 64, 384)       # a2 shortcut
    conv_case("s1_2x2_256_256", 38, 2, 256, 256)     # b2 middle (k=2 SAME!)
    conv_case("s1_3x3_256_256", 38, 3, 256, 256)     # c2 middle
    conv_case("s1_1x1_384_128", 38, 1, 384, 128)
    conv_case("s1_3x3_128_128", 38, 3, 128, 128)     # b3-d3 middle
    conv_case("s1_1x1_128_384", 38, 1, 128, 384)
    conv_case("s1_1x1_384_384", 38, 1, 384, 384)     # a3 shortcut

    # 1x1 as dot_general ---------------------------------------------------
    def matmul_1x1(x, w):
        b, h, wd, cin = x.shape
        cout = w.shape[-1]
        y = jnp.dot(x.reshape(b * h * wd, cin), w.reshape(cin, cout))
        return y.reshape(b, h, wd, cout)

    for cin, cout in ((256, 384), (384, 128), (128, 384)):
        x = rng.normal(0, 1, (B, 38, 38, cin))
        w = rng.normal(0, 0.05, (1, 1, cin, cout))
        flops = 2.0 * B * 38 * 38 * cin * cout
        measure(f"s1_dot_1x1_{cin}_{cout}", matmul_1x1, x, w, flops)

    # ---- neck: fc6 dilated vs center-tap 1x1 ----------------------------
    x5 = rng.normal(0, 1, (B, 5, 5, 1024))
    w6 = rng.normal(0, 0.03, (3, 3, 1024, 1024))
    dil = conv_fn(3, 1024, 1024, dilation=6)

    def fc6_center(x, w):
        return jax.lax.conv_general_dilated(
            x, w[1:2, 1:2], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    a = dil(jnp.asarray(x5, bf16), jnp.asarray(w6, bf16))
    b = fc6_center(jnp.asarray(x5, bf16), jnp.asarray(w6, bf16))
    exact = bool(jnp.all(a == b))
    print(json.dumps({"check": "fc6_center_tap_exact", "equal": exact}),
          flush=True)
    flops_dil = 2.0 * B * 5 * 5 * 9 * 1024 * 1024
    measure("neck_fc6_dilated", dil, x5, w6, flops_dil)
    measure("neck_fc6_center1x1", fc6_center, x5, w6, flops_dil / 9)

    # ---- heads: separate conf+loc vs fused ------------------------------
    n_box, n_cls = 4, 21
    for hw, cin in ((38, 384), (19, 512), (10, 1024)):
        x = rng.normal(0, 1, (B, hw, hw, cin))
        wc = rng.normal(0, 0.05, (3, 3, cin, n_box * n_cls))
        wl = rng.normal(0, 0.05, (3, 3, cin, n_box * 4))
        wf = np.concatenate([wc, wl], axis=-1)
        f = conv_fn(3, cin, 0)

        def pair(x, w):
            wc_, wl_ = w[..., : n_box * n_cls], w[..., n_box * n_cls:]
            return f(x, wc_), f(x, wl_)

        flops = 2.0 * B * hw * hw * 9 * cin * (n_box * (n_cls + 4))
        # measure() expects a single w operand; pass the fused block and
        # slice inside so both variants share operands and FLOP count.
        measure(f"head_{hw}_pair", lambda x, w: jnp.concatenate(
            pair(x, w), axis=-1), x, wf, flops)
        measure(f"head_{hw}_fused", f, x, wf, flops)

    # ---- BN(train) + relu around the whale conv -------------------------
    from flax import linen as nn

    class BnConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.BatchNorm(use_running_average=False, momentum=0.99,
                             epsilon=1e-3, dtype=bf16)(x)
            x = nn.relu(x)
            return nn.Conv(128, (3, 3), padding="SAME", dtype=bf16,
                           use_bias=False)(x)

    mod = BnConv()
    x = jnp.asarray(rng.normal(0, 1, (B, 38, 38, 128)), bf16)
    variables = mod.init(jax.random.PRNGKey(0), x)
    flops = 2.0 * B * 38 * 38 * 9 * 128 * 128

    def bnconv_fwd_bwd(c):
        cc, acc = c

        def loss(p):
            out, _ = mod.apply({"params": p,
                                "batch_stats": variables["batch_stats"]},
                               cc, mutable=["batch_stats"])
            return jnp.sum(out).astype(jnp.float32)

        v, g = jax.value_and_grad(loss)(variables["params"])
        d = (v * 1e-12 +
             jnp.sum(g["Conv_0"]["kernel"]).astype(jnp.float32) * 1e-12)
        return (cc + d.astype(bf16), acc + d)

    s = chained_seconds(bnconv_fwd_bwd, (x, jnp.float32(0)), args.chain,
                        trials=args.trials)
    print(json.dumps({"op": "bn_relu_conv3x3_128_fwd_bwd",
                      "us": round(s * 1e6, 1),
                      "gflop": round(3 * flops / 1e9, 2),
                      "mfu": round(3 * flops / s / (PEAK_TFLOPS * 1e12),
                                   3)}), flush=True)


if __name__ == "__main__":
    main()
