#!/usr/bin/env python
"""Measure the mAP effect of the reference's mixed matching IoU.

The reference evaluator's 'include'-border matching secretly computes the
intersection with 'half' borders (`bounding_box_utils.py:348` drops
border_pixels — see tests/test_reference_parity.py).  This script
quantifies what that quirk is WORTH on trained checkpoints: one device
predict pass per run dir, then the host matching executed twice —
consistent +1px vs the reference's mixed formula — on identical
predictions.  One JSON line per checkpoint + a summary.

Usage:
  JPEG_DCT_PLATFORM=cpu python scripts/iou_mode_ab.py \
      --run-dirs /tmp/proxy_runs/local_proxy_host_* \
      --voc-root /tmp/voc_shapes [--image-set test.txt]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run-dirs", nargs="+", required=True)
    p.add_argument("--voc-root", required=True)
    p.add_argument("--image-set", default="test.txt")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--platform", default=os.environ.get(
        "JPEG_DCT_PLATFORM", "cpu"))
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)
    from jpeg_detection_resnet_ssd_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache(jax, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", ".jax_cache"))

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
    from jpeg_detection_resnet_ssd_tpu.train.checkpoints import (
        CheckpointManager,
    )
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer

    run_dirs = sorted(
        d for pat in args.run_dirs for d in glob.glob(pat)
        if os.path.isdir(os.path.join(d, "checkpoints"))
        and os.listdir(os.path.join(d, "checkpoints"))
    )
    ds = DetectionDataset.from_voc(
        os.path.join(args.voc_root, "JPEGImages"),
        os.path.join(args.voc_root, "ImageSets", "Main", args.image_set),
        os.path.join(args.voc_root, "Annotations"),
    )
    deltas = []
    for run_dir in run_dirs:
        config = ExperimentConfig.load(
            os.path.join(run_dir, "saved_config.json"))
        trainer, module, example_inputs = build_trainer(config)
        with trainer.mesh:
            state = trainer.init_state(
                jax.random.PRNGKey(0), example_inputs())
            state = CheckpointManager(
                os.path.join(run_dir, "checkpoints")).restore(state)
            decode = make_inference_fn(
                n_classes=20, spec=AnchorSpec(),
                candidate_selector="exact",
            )

            @jax.jit
            def infer(inputs):
                return decode(module.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    inputs, train=False,
                ).astype(jax.numpy.float32))

            pipe = DetectionPipeline(
                ds, args.batch_size, train=False, encoder=None,
                input_format=config.input_format, num_workers=4,
            )
            ev = DetectionEvaluator(infer, pipe, n_classes=20)
            ev.predict_on_dataset()  # ONE device pass; matching re-runs
            map_consistent, _, _ = ev(intersection_border=None)
            map_mixed, _, _ = ev(intersection_border="half")
        delta = map_mixed - map_consistent
        deltas.append(delta)
        print(json.dumps({
            "run_dir": os.path.basename(run_dir),
            "mAP_consistent_plus1": round(map_consistent, 4),
            "mAP_reference_mixed": round(map_mixed, 4),
            "delta": round(delta, 4),
        }), flush=True)
    if deltas:
        import numpy as np

        print(json.dumps({
            "summary": "reference-mixed minus consistent",
            "n": len(deltas),
            "delta_mean": round(float(np.mean(deltas)), 4),
            "delta_min": round(float(np.min(deltas)), 4),
            "delta_max": round(float(np.max(deltas)), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
