#!/usr/bin/env python
"""Held-out-mAP convergence proxy on structured synthetic VOC data.

The environment has no ImageNet/VOC (PARITY_PLAYBOOK.md), so this is the
strongest obtainable accuracy evidence: a generated detection corpus with
REAL signal — per-class shape + texture on cluttered backgrounds — split
into disjoint train/test, trained with the production `fit()` path and
scored with the `evaluate`-CLI protocol on the HELD-OUT set.  Unlike the
round-1 12-noise-image memorization run, a non-trivial held-out mAP here
requires actual generalization.

Variants (--variant):
  host    : host Caffe-SSD augmentation chain (SSDDataAugmentation)
  device  : --device-augment analog (full v2 DCT-domain chain in-step)
  none    : resize-only (augmentation ablation baseline)
  rgb     : host chain + RGB VGG16-SSD300 (`ssd300_vgg`) — the DCT-vs-RGB
            comparison of the reference's README tables

Usage:
  python scripts/convergence_proxy.py --variant host --steps 3000 \
      --data-root /tmp/voc_shapes [--platform cpu]

Prints one JSON line per run; aggregate results land in BENCHMARK.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Round 3: ALL 20 VOC classes, each a distinct (silhouette, texture, color)
# combination — 5 shapes x 4 textures, one hue per class — so held-out AP
# requires appearance discrimination across the full class space (VERDICT
# round-2 item: "20-class structured corpus").
from jpeg_detection_resnet_ssd_tpu.data.datasets import VOC_CLASSES

SHAPE_CLASSES = list(VOC_CLASSES)  # all 20


def _class_color(cls_idx):
    """Distinct hue per class (HSV wheel), full saturation/value."""
    import colorsys

    h = (cls_idx * 0.413) % 1.0  # golden-ratio-ish spacing
    r, g, b = colorsys.hsv_to_rgb(h, 0.85, 1.0)
    return np.array([r, g, b])


def _texture(rng, h, w, cls_idx):
    """Per-class texture so classification requires appearance, not just
    shape silhouettes: texture family = cls_idx // 5, color per class."""
    yy, xx = np.mgrid[0:h, 0:w]
    kind = cls_idx // 5
    if kind == 0:    # horizontal stripes
        base = ((yy // 4) % 2) * 200.0 + 30
    elif kind == 1:  # vertical stripes
        base = ((xx // 4) % 2) * 200.0 + 30
    elif kind == 2:  # checkerboard
        base = (((yy // 5) + (xx // 5)) % 2) * 200.0 + 30
    else:            # diagonal gradient
        base = 255.0 * ((yy + xx) % 24) / 24.0
    tex = base[..., None] * _class_color(cls_idx)[None, None]
    tex += rng.normal(0, 10, tex.shape)
    return np.clip(tex, 0, 255)


def _draw_shape(img, rng, cls_idx, x0, y0, w, h):
    """Paint the class texture inside the class silhouette; returns bbox.

    Silhouette family = cls_idx % 5 (rectangle/ellipse/triangle/diamond/
    cross)."""
    tex = _texture(rng, h, w, cls_idx)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = (h - 1) / 2, (w - 1) / 2
    shape = cls_idx % 5
    if shape == 0:      # rectangle
        mask = np.ones((h, w), bool)
    elif shape == 1:    # ellipse
        mask = ((yy - cy) / (h / 2)) ** 2 + ((xx - cx) / (w / 2)) ** 2 <= 1.0
    elif shape == 2:    # triangle
        mask = (yy / max(h - 1, 1)) >= np.abs(xx - cx) / max(cx, 1)
    elif shape == 3:    # diamond
        mask = (np.abs(yy - cy) / (h / 2) + np.abs(xx - cx) / (w / 2)) <= 1.0
    else:               # cross
        mask = (np.abs(xx - cx) <= w / 6) | (np.abs(yy - cy) <= h / 6)
    region = img[y0 : y0 + h, x0 : x0 + w]
    region[mask] = tex[mask]
    return x0, y0, x0 + w, y0 + h


def generate_corpus(root: str, n_train=256, n_test=64, size=320, seed=7):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/JPEGImages", exist_ok=True)
    os.makedirs(f"{root}/Annotations", exist_ok=True)
    os.makedirs(f"{root}/ImageSets/Main", exist_ok=True)
    ids = []
    for i in range(n_train + n_test):
        iid = f"{i:06d}"
        ids.append(iid)
        # cluttered background: smooth noise + random non-class distractors
        img = rng.normal(120, 30, (size, size, 3))
        for _ in range(6):  # distractor blobs (solid color, no class texture)
            bw, bh = rng.integers(10, 40, 2)
            bx, by = rng.integers(0, size - 40, 2)
            img[by : by + bh, bx : bx + bw] = rng.integers(0, 255, 3)
        objs = []
        for _ in range(int(rng.integers(1, 4))):
            c = int(rng.integers(0, len(SHAPE_CLASSES)))
            w = int(rng.integers(48, 160))
            h = int(rng.integers(48, 160))
            x0 = int(rng.integers(0, size - w))
            y0 = int(rng.integers(0, size - h))
            bbox = _draw_shape(img, rng, c, x0, y0, w, h)
            objs.append((SHAPE_CLASSES[c], *bbox))
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            f"{root}/JPEGImages/{iid}.jpg", quality=92
        )
        xo = "\n".join(
            f"  <object><name>{c}</name><difficult>0</difficult>"
            f"<truncated>0</truncated>\n    <bndbox><xmin>{a + 1}</xmin>"
            f"<ymin>{b + 1}</ymin><xmax>{cc}</xmax><ymax>{dd}</ymax>"
            f"</bndbox>\n  </object>"
            for c, a, b, cc, dd in objs
        )
        with open(f"{root}/Annotations/{iid}.xml", "w") as f:
            f.write(
                f"<annotation>\n  <size><width>{size}</width>"
                f"<height>{size}</height><depth>3</depth></size>\n{xo}\n"
                f"</annotation>"
            )
    with open(f"{root}/ImageSets/Main/trainval.txt", "w") as f:
        f.write("\n".join(ids[:n_train]) + "\n")
    with open(f"{root}/ImageSets/Main/test.txt", "w") as f:
        f.write("\n".join(ids[n_train:]) + "\n")
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="host",
                   choices=["host", "device", "device_v3", "device_v4",
                            "device_v5", "none", "rgb"])
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--data-root", default="/tmp/voc_shapes")
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--n-test", type=int, default=64)
    p.add_argument("--platform", default=None)
    p.add_argument("--num-workers", type=int, default=12)
    p.add_argument("--output-dir", default="/tmp/proxy_runs")
    p.add_argument("--seed", type=int, default=0,
                   help="training seed (init/shuffle/augment); the corpus "
                        "seed is fixed so every run sees identical data")
    p.add_argument("--freeze-bn", action="store_true",
                   help="train with BatchNorm frozen (config.freeze_bn). "
                        "From random init this diverges (identity BN on "
                        "raw DCT coefficients); the intended experiment is "
                        "two-phase: run N steps normally, then --resume "
                        "--freeze-bn for the remainder — convergence "
                        "evidence for the frozen-BN fine-tune recipe at a "
                        "matched total step count")
    p.add_argument("--resume", action="store_true",
                   help="resume the latest run dir for this variant+seed "
                        "from its newest checkpoint instead of starting a "
                        "fresh run (for relay/preemption retries; the "
                        "shuffled data order after the resume point differs "
                        "from an uninterrupted run, augmentation draws are "
                        "random either way)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if not os.path.exists(f"{args.data_root}/ImageSets/Main/test.txt"):
        print(f"generating corpus at {args.data_root} ...", flush=True)
        generate_corpus(args.data_root, args.n_train, args.n_test)

    import jax

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
    from jpeg_detection_resnet_ssd_tpu.data import (
        DetectionDataset,
        DetectionPipeline,
    )
    from jpeg_detection_resnet_ssd_tpu.data.augment import SSDDataAugmentation
    from jpeg_detection_resnet_ssd_tpu.eval import DetectionEvaluator
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        make_inference_fn,
        ssd_predictor_sizes,
    )
    from jpeg_detection_resnet_ssd_tpu.train.config import (
        ExperimentConfig,
        create_run_dir,
        find_latest_run,
    )
    from jpeg_detection_resnet_ssd_tpu.train.loop import fit

    root = args.data_root
    ds = DetectionDataset.from_voc(
        f"{root}/JPEGImages", f"{root}/ImageSets/Main/trainval.txt",
        f"{root}/Annotations",
    )
    model_name = "ssd300_vgg" if args.variant == "rgb" else "ssd300_ssd_custom"
    input_format = "rgb" if args.variant == "rgb" else "dct"
    device_variant = args.variant in (
        "device", "device_v3", "device_v4", "device_v5"
    )
    # fit()'s inner loop ends when the pipeline's epoch (one corpus pass)
    # ends, so epochs must be sized for max_steps to be the binding limit.
    steps_per_pass = max(1, len(ds) // args.batch_size)
    epochs = -(-args.steps // steps_per_pass)  # ceil
    steps_per_epoch = steps_per_pass
    config = ExperimentConfig(
        model=model_name,
        model_kwargs={"n_classes": 20},
        task="detection",
        input_format=input_format,
        learning_rate=args.lr,
        batch_size=args.batch_size,
        epochs=epochs,
        steps_per_epoch=steps_per_epoch,
        num_workers=args.num_workers,
        output_dir=args.output_dir,
        project=f"proxy_{args.variant}_s{args.seed}",
        seed=args.seed,
        restart=args.resume,
        freeze_bn=args.freeze_bn,
    )

    family = "vgg" if args.variant == "rgb" else "resnet_custom"
    augment_fn = None
    if device_variant:
        from jpeg_detection_resnet_ssd_tpu.data.packed import (
            PackedDctDataset,
            PackedDctPipeline,
        )
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_detection_augment_v2,
            make_dct_detection_augment_v3,
        )

        encoder = TargetEncoder(
            spec=AnchorSpec(img_height=304, img_width=304),
            predictor_sizes=ssd_predictor_sizes(family),
            n_classes=20,
        )
        if args.variant in ("device_v3", "device_v4", "device_v5"):
            # continuous-scale expand/crop/resize (closes the scale gap);
            # v4 additionally swaps the chroma-rotation photometric for the
            # exact pixel-space HSV chain (ops/pixel_photometric.py);
            # v5 = v4 + per-view JPEG requantization (ops/jpeg_quant.py),
            # matching the host chain's re-encode quantization grid
            augment_fn = make_dct_detection_augment_v3(
                out_y_blocks=38,
                photometric=(
                    "pixel_hsv" if args.variant in ("device_v4", "device_v5")
                    else True
                ),
                requantize_quality=(
                    75 if args.variant == "device_v5" else None
                ),
            )
        else:
            augment_fn = make_dct_detection_augment_v2(out_y_blocks=38)
        # decode-once packed corpus: identical tensors to the host 352px
        # decode path (tests pin equality), device-bound throughput
        stem = os.path.join(args.data_root, "packed_352")
        if not os.path.exists(stem + ".meta.json"):
            PackedDctDataset.create(
                ds, stem, img_height=352, img_width=352,
                num_workers=args.num_workers,
            )
        pipe = PackedDctPipeline(
            PackedDctDataset(stem), config.batch_size, train=True,
            seed=config.seed, ship_dtype="int16",
        )
    else:
        encoder = TargetEncoder(
            spec=AnchorSpec(),
            predictor_sizes=ssd_predictor_sizes(family),
            n_classes=20,
        )
        augmentation = (
            None if args.variant == "none" else SSDDataAugmentation()
        )
        pipe = DetectionPipeline(
            ds, config.batch_size, train=True, encoder=encoder,
            augmentation=augmentation, input_format=input_format,
            num_workers=config.num_workers, seed=config.seed,
            device_encode=True,
        )

    run_dir = find_latest_run(config) if args.resume else None
    if run_dir is None:
        run_dir = create_run_dir(config)
    print(f"run dir: {run_dir}", flush=True)
    state, history = fit(
        config, pipe, run_dir=run_dir, max_steps=args.steps,
        target_encoder=encoder.encode_fn, augment_fn=augment_fn,
        save_every=50,  # tiny epochs: per-epoch orbax saves dominate wall
    )
    final = history[-1] if history else {}

    # held-out evaluation, reference mAP protocol (exact decode)
    module, _ = build_model(model_name, n_classes=20)
    test_ds = DetectionDataset.from_voc(
        f"{root}/JPEGImages", f"{root}/ImageSets/Main/test.txt",
        f"{root}/Annotations",
    )
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)

    # Both candidate selectors on the SAME trained weights: 'exact' is the
    # reference mAP protocol; 'shared' is the serving default whose mAP
    # delta the round-2 verdict asked to MEASURE rather than assert.
    results = {}
    for selector in ("exact", "shared"):
        decode = make_inference_fn(
            n_classes=20, spec=AnchorSpec(), candidate_selector=selector
        )

        @jax.jit
        def infer(inputs, decode=decode):
            return decode(
                module.apply(
                    {"params": params, "batch_stats": stats}, inputs,
                    train=False
                ).astype(jax.numpy.float32)
            )

        eval_pipe_i = DetectionPipeline(
            test_ds, 8, train=False, encoder=None, augmentation=None,
            input_format=input_format, num_workers=4,
        )
        evaluator = DetectionEvaluator(infer, eval_pipe_i, n_classes=20)
        mean_ap, aps, _ = evaluator()
        results[selector] = (mean_ap, aps)

    mean_ap, aps = results["exact"]
    out = {
        "variant": (args.variant + "_freezebn" if args.freeze_bn
                    else args.variant),
        "seed": args.seed,
        "model": model_name,
        "steps": args.steps,
        "train_images": len(ds),
        "test_images": len(test_ds),
        "final_train_loss": final.get("total_loss"),
        "heldout_mAP": round(mean_ap, 4),
        "heldout_mAP_shared_selector": round(results["shared"][0], 4),
        "selector_delta": round(results["shared"][0] - mean_ap, 5),
        "heldout_AP_nonzero": {
            VOC_CLASSES[c - 1]: round(aps[c], 4)
            for c in range(1, 21)
            if aps[c] > 0
        },
        "run_dir": run_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
