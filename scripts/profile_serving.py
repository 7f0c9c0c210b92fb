"""Serving-path profile: BN folding A/B + AOT-exported artifact dispatch.

Measures, under the honest chained-slope protocol (BENCHMARK.md
"measurement integrity"):

  * eval-mode forward, stock variables (baseline — XLA already fuses the
    BN affine into the conv epilogue, so this pins what folding actually
    buys ON TOP of the compiler);
  * eval-mode forward, BN-folded variables (`serve.fold_batch_norm`);
  * forward + full decode with the serving config (shared candidate pool,
    Pallas NMS) on folded variables — the serving headline;
  * the same program AOT-exported via `jax.export` and re-loaded, called
    inside the timing scan — pins whether the exported artifact carries
    any overhead vs the in-process jit.

Usage: python scripts/profile_serving.py [--batch 32] [--chain 20]
Prints one JSON object per measurement and a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from jpeg_detection_resnet_ssd_tpu.utils.timing import chained_seconds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--pool", type=int, default=1024)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for smoke runs)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.boxes.anchors import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        make_inference_fn,
    )
    from jpeg_detection_resnet_ssd_tpu.serve import (
        build_serving_fn,
        export_serving_artifact,
        fold_batch_norm,
        load_serving_artifact,
    )

    B = args.batch
    module, _ = build_model("ssd300_ssd_custom", n_classes=20,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 100, (B, 38, 38, 64)), jnp.float32)
    cbcr = jnp.asarray(rng.normal(0, 30, (B, 19, 19, 128)), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), (y[:1], cbcr[:1]),
                            train=False)
    folded = fold_batch_norm(variables)
    on_tpu = jax.devices()[0].platform == "tpu"
    decode = make_inference_fn(
        n_classes=20, spec=AnchorSpec(), candidate_selector="shared",
        shared_pool_size=args.pool,
        nms_impl="pallas" if on_tpu else "xla",
    )

    results = {}

    def record(name, seconds):
        results[name] = seconds * 1e3
        print(json.dumps({"component": name,
                          "ms_per_batch": round(seconds * 1e3, 3),
                          "img_per_s": round(B / seconds, 1)}), flush=True)

    def fwd_with(v):
        def fwd(c):
            out = module.apply(v, (c, cbcr), train=False)
            return c + jnp.sum(out).astype(jnp.float32) * 1e-12

        return fwd

    record("fwd_stock", chained_seconds(fwd_with(variables), y, args.chain))
    record("fwd_folded", chained_seconds(fwd_with(folded), y, args.chain))

    # int8 trunk (serve/quantize.py): the MXU runs int8 at ~2x bf16 — this
    # row pins what post-training quantization actually buys end-to-end.
    from jpeg_detection_resnet_ssd_tpu.serve import quantize_for_serving

    qfn, qinfo = quantize_for_serving(module, variables, [(y, cbcr)])
    print(json.dumps({"component": "quantize_info",
                      "n_quantized": len(qinfo["quantized"]),
                      "n_kept_float": len(qinfo["kept_float"])}), flush=True)

    def fwd_q(c):
        out = qfn((c, cbcr))
        return c + jnp.sum(out).astype(jnp.float32) * 1e-12

    record("fwd_int8_trunk", chained_seconds(fwd_q, y, args.chain))

    def fwd_decode(c):
        preds = module.apply(folded, (c, cbcr), train=False)
        out = decode(preds.astype(jnp.float32))
        return c + jnp.sum(out[:, :, 1]) * 1e-9

    record("fwd_decode_folded_shared",
           chained_seconds(fwd_decode, y, args.chain))

    # AOT-exported artifact for the NATIVE platform, called inside the
    # timing scan (exported functions are traceable, so the chained
    # protocol applies unchanged).
    serving = build_serving_fn(module, variables, decode_fn=lambda p: decode(
        p.astype(jnp.float32)))
    art_dir = "/tmp/profile_serving_artifact"
    try:
        export_serving_artifact(serving, (np.asarray(y), np.asarray(cbcr)),
                                art_dir)
        loaded, _ = load_serving_artifact(art_dir)

        def exported_call(c):
            out = loaded(c, cbcr)
            return c + jnp.sum(out[:, :, 1]) * 1e-9

        record("fwd_decode_exported_artifact",
               chained_seconds(exported_call, y, args.chain))
    except Exception as e:  # keep the A/B rows if export can't serialize
        print(json.dumps({"component": "fwd_decode_exported_artifact",
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)

    print(json.dumps({
        "summary_ms": {n: round(v, 3) for n, v in results.items()},
        "platform": jax.devices()[0].platform,
        "folding_delta_ms": round(
            results["fwd_stock"] - results["fwd_folded"], 3
        ),
        "export_overhead_ms": round(
            results["fwd_decode_exported_artifact"]
            - results["fwd_decode_folded_shared"], 3
        ) if "fwd_decode_exported_artifact" in results else None,
    }))


if __name__ == "__main__":
    main()
