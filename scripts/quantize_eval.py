#!/usr/bin/env python
"""Held-out-mAP cost of serving-graph transforms on a TRAINED checkpoint.

Evaluates one convergence-proxy run (scripts/convergence_proxy.py) under
the reference mAP protocol four ways:

  float        : the checkpoint as trained (reproduces the proxy's
                 heldout_mAP — sanity anchor)
  folded       : BatchNorm folded (serve/folding.py) — must be ~exact
  int8         : quantized trunk, default skip list (input stems + heads
                 float), activation scales calibrated on train batches
  int8_all     : quantized EVERYTHING (no skips) — shows what the skip
                 list protects

Usage:
  python scripts/quantize_eval.py --run-dir /tmp/proxy_r3/runs/<run> \
      --data-root /tmp/voc_shapes20 [--platform cpu] [--calib-batches 4]

Prints one JSON line per variant and a summary with mAP deltas.
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
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--calib-batches", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.data import (
        DetectionDataset,
        DetectionPipeline,
    )
    from jpeg_detection_resnet_ssd_tpu.eval import DetectionEvaluator
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        make_inference_fn,
    )
    from jpeg_detection_resnet_ssd_tpu.serve import (
        fold_batch_norm,
        quantize_for_serving,
    )
    from jpeg_detection_resnet_ssd_tpu.train.checkpoints import (
        CheckpointManager,
    )
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer

    config = ExperimentConfig.load(
        os.path.join(args.run_dir, "saved_config.json")
    )
    trainer, module_t, example_inputs = build_trainer(config)
    with trainer.mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), example_inputs())
        state = CheckpointManager(
            os.path.join(args.run_dir, "checkpoints")
        ).restore(state)
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    # evaluate in f32 regardless of the training compute dtype (the
    # reference protocol; matches convergence_proxy's eval)
    module, _ = build_model(config.model, n_classes=20)
    root = args.data_root
    input_format = config.input_format

    test_ds = DetectionDataset.from_voc(
        f"{root}/JPEGImages", f"{root}/ImageSets/Main/test.txt",
        f"{root}/Annotations",
    )
    train_ds = DetectionDataset.from_voc(
        f"{root}/JPEGImages", f"{root}/ImageSets/Main/trainval.txt",
        f"{root}/Annotations",
    )
    calib = []
    calib_pipe = DetectionPipeline(
        train_ds, args.batch_size, train=False, encoder=None,
        augmentation=None, input_format=input_format, num_workers=2,
    )
    for batch in calib_pipe:
        calib.append(batch["inputs"])
        if len(calib) >= args.calib_batches:
            break

    decode = make_inference_fn(
        n_classes=20, spec=AnchorSpec(), candidate_selector="exact"
    )

    def evaluate(apply_fn):
        @jax.jit
        def infer(inputs):
            return decode(apply_fn(inputs).astype(jnp.float32))

        pipe = DetectionPipeline(
            test_ds, args.batch_size, train=False, encoder=None,
            augmentation=None, input_format=input_format, num_workers=4,
        )
        mean_ap, aps, _ = DetectionEvaluator(infer, pipe, n_classes=20)()
        return mean_ap, aps

    results = {}

    def record(name, apply_fn, extra=None):
        mean_ap, aps = evaluate(apply_fn)
        results[name] = mean_ap
        row = {"variant": name, "heldout_mAP": round(mean_ap, 4),
               "present_class_AP": {
                   c: round(aps[c], 4) for c in range(1, 21) if aps[c] > 0
               }}
        row.update(extra or {})
        print(json.dumps(row), flush=True)

    record("float",
           lambda x: module.apply(variables, x, train=False))

    folded = fold_batch_norm(variables)
    record("folded",
           lambda x: module.apply(folded, x, train=False))

    qfn, qinfo = quantize_for_serving(module, variables, calib)
    record("int8", qfn,
           {"n_quantized": len(qinfo["quantized"]),
            "kept_float": qinfo["kept_float"]})

    qfn_all, qinfo_all = quantize_for_serving(module, variables, calib,
                                              skip=())
    record("int8_all", qfn_all,
           {"n_quantized": len(qinfo_all["quantized"])})

    print(json.dumps({
        "run_dir": args.run_dir,
        "summary_mAP": {k: round(v, 4) for k, v in results.items()},
        "fold_delta": round(results["folded"] - results["float"], 5),
        "int8_delta": round(results["int8"] - results["float"], 5),
        "int8_all_delta": round(results["int8_all"] - results["float"], 5),
    }))


if __name__ == "__main__":
    main()
