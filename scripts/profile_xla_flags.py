"""A/B the flagship train step under candidate XLA TPU compiler options.

The round-3 component profile (BENCHMARK.md) attributes the remaining
train-step MFU gap (~47% vs forward's ~72%) to XLA's conv-backward kernels.
Before reaching for Pallas convs, this measures the documented compiler
levers that change conv scheduling/fusion without touching model code:

  * xla_tpu_scoped_vmem_limit_kib=<N> — raises the VMEM budget the
    fusion pass may assume, enabling larger fused convs;
  * xla_tpu_enable_latency_hiding_scheduler=true — overlaps HBM copies
    with compute inside the step;
  * the two combined.

Delivery mechanism (measured, round 3): the XLA_FLAGS env var is a DEAD
ROUTE in this environment — the relay client's own XLA build parses the
env var locally and aborts on any TPU-backend flag (`parse_flags_from_env:
Unknown flag in XLA_FLAGS: --xla_tpu_scoped_vmem_limit_kib`).  Per-compile
PJRT `compiler_options` (`jax.jit(f).lower().compile(compiler_options=...)`)
bypass the client parser and are forwarded to the backend compiler, so that
is what this script uses.  A side benefit: options are per-executable, so
every config runs INTERLEAVED in ONE process on ONE relay chip with one
matmul canary — the strongest same-process comparison available (chips from
the pool vary in load; cross-process A/Bs need canary normalization).

Usage: python scripts/profile_xla_flags.py [--chain 10] [--trials 3]
Prints one JSON row per config; configs whose options the backend rejects
report the error instead of a time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    "baseline": {},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "both": {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_enable_latency_hiding_scheduler": "true",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config names")
    args = ap.parse_args()

    import jax

    # Persistent compilation cache (same contract as the CLI): the scanned
    # train-step programs compile in minutes through the relay; the cache key
    # includes the compiler options, so each config pays its compile once per
    # machine and retries are cheap.
    cache_dir = os.environ.get(
        "JPEG_DCT_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "jpeg_dct_xla"),
    )
    if cache_dir and cache_dir != "0":
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import optax

    from jpeg_detection_resnet_ssd_tpu.utils.timing import slope_seconds
    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
    from jpeg_detection_resnet_ssd_tpu.losses import SSDLoss
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        ssd_predictor_sizes,
    )

    B = 32

    # same-process canary: relay chips differ run to run
    k = 4096
    a = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.02, (k, k)), jnp.bfloat16
    )

    def build_canary(n):
        @jax.jit
        def chained():
            def body(c, _):
                return c @ a, None
            out, _ = jax.lax.scan(body, a, None, length=n)
            return jnp.sum(out).astype(jnp.float32)
        return chained

    t = slope_seconds(build_canary, 50, trials=args.trials)
    canary_tflops = 2 * k**3 / t / 1e12
    print(json.dumps({"canary_tflops": round(canary_tflops, 1)}), flush=True)

    module, _ = build_model("ssd300_ssd_custom", n_classes=20,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 100, (B, 38, 38, 64)), jnp.float32)
    cbcr = jnp.asarray(rng.normal(0, 30, (B, 19, 19, 128)), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), (y[:1], cbcr[:1]),
                            train=False)
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
    gt, gt_mask = jnp.asarray(gt), jnp.asarray(gt_mask)
    loss_obj = SSDLoss()
    tx = optax.sgd(1e-3, momentum=0.9)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    def chained_program(n):
        def chained():
            def body(carry, i):
                p, o = carry
                gt_i = gt.at[..., 1:].add(i.astype(jnp.float32) * 1e-6)
                tgt = encoder.encode_fn(gt_i, gt_mask)

                def loss_of(pp):
                    out, _ = module.apply(
                        {"params": pp, "batch_stats": batch_stats},
                        (y, cbcr), train=True, mutable=["batch_stats"],
                    )
                    return loss_obj(tgt, out.astype(jnp.float32))

                loss, grads = jax.value_and_grad(loss_of)(p)
                updates, o2 = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o2), loss

            (p_out, _), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n)
            )
            first = jax.tree_util.tree_leaves(p_out)[0]
            return jnp.sum(first).astype(jnp.float32) + jnp.sum(losses)

        return chained

    names = (args.configs.split(",") if args.configs else list(CONFIGS))
    for name in names:
        opts = CONFIGS[name]

        def build(n, _opts=opts):
            compiled = (
                jax.jit(chained_program(n))
                .lower()
                .compile(compiler_options=_opts or None)
            )
            return compiled

        try:
            t = slope_seconds(build, args.chain, trials=args.trials)
            print(json.dumps({
                "config": name,
                "compiler_options": opts,
                "canary_tflops": round(canary_tflops, 1),
                "train_step_ms": round(t * 1e3, 2),
                "images_per_sec": round(B / t, 1),
            }), flush=True)
        except Exception as e:  # backend may reject unknown options
            print(json.dumps({
                "config": name,
                "compiler_options": opts,
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)


if __name__ == "__main__":
    main()
