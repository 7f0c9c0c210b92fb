#!/usr/bin/env python
"""Held-out top-1 convergence proxy for DCT classification.

Classification counterpart of `convergence_proxy.py` (the reference's
headline there is ImageNet top-1, `README.md:199-211`, unavailable offline):
a generated corpus of texture-coded classes with distractor clutter, split
train/test, trained with the production classification path and scored on
the HELD-OUT split.

Variants (--variant):
  device : packed corpus + DCT-domain crop/flip/photometric in-step
           (`train-classify --device-augment --pack-cache` analog)
  host   : host pixel augmentation (classification_train_view), dct inputs
  rgb    : host augmentation + ResNet50-RGB — the DCT-vs-RGB comparison

Usage:
  python scripts/cls_convergence_proxy.py --variant device --steps 1500
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from convergence_proxy import _texture  # noqa: E402  (same dir)

N_CLASSES = 8


def generate_corpus(root, n_train=512, n_test=128, size=288, seed=11):
    from PIL import Image

    rng = np.random.default_rng(seed)
    ids = []
    for i in range(n_train + n_test):
        c = int(rng.integers(0, N_CLASSES))
        img = rng.normal(120, 30, (size, size, 3))
        for _ in range(4):  # clutter
            bw, bh = rng.integers(10, 30, 2)
            bx, by = rng.integers(0, size - 30, 2)
            img[by : by + bh, bx : bx + bw] = rng.integers(0, 255, 3)
        # the class object: texture kind = c % 4, scale family = c // 4
        small = c >= 4
        w = int(rng.integers(60, 110)) if small else int(rng.integers(140, 220))
        h = int(rng.integers(60, 110)) if small else int(rng.integers(140, 220))
        x0 = int(rng.integers(0, size - w))
        y0 = int(rng.integers(0, size - h))
        img[y0 : y0 + h, x0 : x0 + w] = _texture(rng, h, w, c % 4)
        split = "train" if i < n_train else "val"
        d = f"{root}/{split}/class_{c}"
        os.makedirs(d, exist_ok=True)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            f"{d}/{i:06d}.JPEG", quality=92
        )
        ids.append(i)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="device",
                   choices=["device", "host", "rgb"])
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--data-root", default="/tmp/cls_shapes")
    p.add_argument("--platform", default=None)
    p.add_argument("--num-workers", type=int, default=12)
    p.add_argument("--output-dir", default="/tmp/cls_proxy_runs")
    p.add_argument("--seed", type=int, default=0,
                   help="training seed (init/shuffle/augment); the corpus "
                        "seed is fixed so every run sees identical data")
    p.add_argument("--resume", action="store_true",
                   help="resume the latest run dir for this variant+seed "
                        "from its newest checkpoint (for relay/preemption "
                        "retries)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if not os.path.isdir(f"{args.data_root}/val"):
        print(f"generating corpus at {args.data_root} ...", flush=True)
        generate_corpus(args.data_root)

    import jax

    from jpeg_detection_resnet_ssd_tpu.data import (
        ClassificationPipeline,
        ImageFolderDataset,
    )
    from jpeg_detection_resnet_ssd_tpu.train.config import (
        ExperimentConfig,
        create_run_dir,
        find_latest_run,
    )
    from jpeg_detection_resnet_ssd_tpu.train.loop import fit, make_validation_fn

    train_ds = ImageFolderDataset(f"{args.data_root}/train")
    val_ds = ImageFolderDataset(f"{args.data_root}/val")
    model = (
        "resnet50_rgb" if args.variant == "rgb"
        else "resnet50_dct_late_concat_rfa_thinner"
    )
    input_format = "rgb" if args.variant == "rgb" else "dct"
    steps_per_pass = max(1, len(train_ds) // args.batch_size)
    config = ExperimentConfig(
        model=model,
        model_kwargs={"num_classes": N_CLASSES},
        task="classification",
        input_format=input_format,
        learning_rate=args.lr,
        nesterov=True,
        lr_decay=1e-4,
        l2_regularization=0.0,
        batch_size=args.batch_size,
        epochs=-(-args.steps // steps_per_pass),
        steps_per_epoch=steps_per_pass,
        num_workers=args.num_workers,
        output_dir=args.output_dir,
        project=f"clsproxy_{args.variant}_s{args.seed}",
        seed=args.seed,
        restart=args.resume,
    )

    augment_fn = None
    if args.variant == "device":
        from jpeg_detection_resnet_ssd_tpu.data.packed import (
            PackedDctPipeline,
            load_or_create,
        )
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_classification_augment_v2,
        )

        augment_fn = make_dct_classification_augment_v2(out_y_blocks=28)
        packed = load_or_create(
            os.path.join(args.data_root, "packed_256"), train_ds,
            task="classification", img_size=256,
            num_workers=args.num_workers, verbose=False,
        )
        pipe = PackedDctPipeline(packed, config.batch_size, train=True,
                                 seed=config.seed, ship_dtype="int16")
    else:
        pipe = ClassificationPipeline(
            train_ds, config.batch_size, train=True,
            input_format=input_format, num_workers=args.num_workers,
            seed=config.seed,
        )

    run_dir = find_latest_run(config) if args.resume else None
    if run_dir is None:
        run_dir = create_run_dir(config)
    print(f"run dir: {run_dir}", flush=True)
    state, history = fit(
        config, pipe, run_dir=run_dir, max_steps=args.steps,
        augment_fn=augment_fn,
        save_every=50,  # tiny epochs: per-epoch orbax saves dominate wall
    )
    final = history[-1] if history else {}

    # held-out evaluation (deterministic 224 eval view)
    from jpeg_detection_resnet_ssd_tpu.eval import ClassificationEvaluator
    from jpeg_detection_resnet_ssd_tpu.models import build_model

    module, _ = build_model(model, num_classes=N_CLASSES)
    eval_pipe = ClassificationPipeline(
        val_ds, 32, train=False, input_format=input_format,
        num_workers=args.num_workers,
    )
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    infer = jax.jit(lambda x: module.apply(variables, x, train=False))
    metrics = ClassificationEvaluator(infer, eval_pipe)()
    print(json.dumps({
        "variant": args.variant,
        "seed": args.seed,
        "model": model,
        "steps": args.steps,
        "train_images": len(train_ds),
        "test_images": len(val_ds),
        "final_train_top1": final.get("top1"),
        "heldout_top1": round(float(metrics["top1"]), 4),
        "heldout_top5": round(float(metrics["top5"]), 4),
        "run_dir": run_dir,
    }))


if __name__ == "__main__":
    main()
