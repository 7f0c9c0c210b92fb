#!/usr/bin/env python
"""mAP cost of serving-decode shortcuts, measured on a TRAINED checkpoint.

The serving path deviates from the literal reference decode
(`keras_layer_DecodeDetections.py:109-265`: per-class top-400 candidates,
NMS, global top-200) in ways that are throughput levers:

  * candidate_selector='shared' — one global candidate pool before the
    per-class top-k (measured delta 0.0000 on every proxy checkpoint);
  * nms_max_output_size=200 — halves the NMS lanes and the final sort.
    The greedy-NMS keep decision of candidate i depends only on
    higher-scored candidates, so the kept set among the top 200 is
    IDENTICAL to a k=400 run; differences require one class to push >200
    survivors into the global top-200;
  * pool_topk_impl='approx' — `lax.approx_max_k` pool selection (TPU
    partial-reduction top-k; exact-equal on CPU where it lowers to sort).

This script evaluates all four configs on the same trained weights with
the reference mAP protocol over the held-out corpus split and prints the
deltas, so every serving shortcut ships with a measured — not asserted —
accuracy cost (round-2 verdict item #4 methodology).

Usage:
  python scripts/serving_decode_map_ab.py --run-dir /tmp/proxy_r3/runs/<d> \
      --voc-root /tmp/proxy_r3/corpus [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--voc-root", default="/tmp/proxy_r3/corpus")
    ap.add_argument("--image-set", default="test.txt")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ.setdefault("JAX_PLATFORMS", args.platform)
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.data import (
        DetectionDataset,
        DetectionPipeline,
    )
    from jpeg_detection_resnet_ssd_tpu.eval import DetectionEvaluator
    from jpeg_detection_resnet_ssd_tpu.models import make_inference_fn
    from jpeg_detection_resnet_ssd_tpu.train.checkpoints import (
        CheckpointManager,
    )
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer

    config = ExperimentConfig.load(
        os.path.join(args.run_dir, "saved_config.json")
    )
    trainer, module, example_inputs = build_trainer(config)
    with trainer.mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), example_inputs())
        state = CheckpointManager(
            os.path.join(args.run_dir, "checkpoints")
        ).restore(state)
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)

    ds = DetectionDataset.from_voc(
        os.path.join(args.voc_root, "JPEGImages"),
        os.path.join(args.voc_root, "ImageSets", "Main", args.image_set),
        os.path.join(args.voc_root, "Annotations"),
    )

    CONFIGS = {
        "exact_k400 (reference protocol)": dict(
            candidate_selector="exact", nms_max_output_size=400
        ),
        "shared_k400 (round-2 serving)": dict(
            candidate_selector="shared", nms_max_output_size=400
        ),
        "shared_k200 (serving preset)": dict(
            candidate_selector="shared", nms_max_output_size=200
        ),
        "shared_k200_approx_pool": dict(
            candidate_selector="shared", nms_max_output_size=200,
            pool_topk_impl="approx",
        ),
    }

    results = {}
    base = None
    for name, kw in CONFIGS.items():
        decode = make_inference_fn(n_classes=20, spec=AnchorSpec(), **kw)

        @jax.jit
        def infer(inputs, decode=decode):
            out = module.apply(
                {"params": params, "batch_stats": stats}, inputs,
                train=False,
            )
            return decode(out.astype(jnp.float32))

        pipe = DetectionPipeline(
            ds, args.batch_size, train=False, encoder=None,
            augmentation=None, input_format=config.input_format,
            num_workers=4,
        )
        mean_ap, aps, _ = DetectionEvaluator(infer, pipe, n_classes=20)()
        if base is None:
            base = mean_ap
        results[name] = {
            "mAP": round(mean_ap, 4),
            "delta_vs_reference": round(mean_ap - base, 5),
        }
        print(json.dumps({"config": name, **results[name]}), flush=True)

    print(json.dumps({"run_dir": args.run_dir, "results": results}))


if __name__ == "__main__":
    main()
