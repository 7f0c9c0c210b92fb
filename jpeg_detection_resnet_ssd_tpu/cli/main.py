"""CLI: train / evaluate / infer / bench / compute-map subcommands.

Flag names follow the reference scripts where they exist (SURVEY.md §2.3/§2.4):
`--archi`, `--restart`, `--crop/--no_crop`, `--reg/--no_reg`, `--p07/--p07p12`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_train_common(p):
    p.add_argument("--archi", default=None, help="architecture variant")
    p.add_argument("--restart", action="store_true")
    p.add_argument("--config", default=None, help="path to a config JSON")
    p.add_argument("--output-dir", default="experiments")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--pretrained-weights", default=None,
                   help="Keras H5 for by-name transfer")
    p.add_argument("--n-model-shards", type=int, default=1)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="fuse N optimization steps into one compiled "
                        "program (lax.scan over N pre-staged batches): "
                        "identical math, per-step dispatch latency paid "
                        "once per group — decisive on high-latency links")
    p.add_argument("--pallas-wgrad", action="store_true", default=None,
                   help="route eligible 3x3 stride-1 convs' filter "
                        "gradient through the Pallas kernel "
                        "(ops/pallas_conv_grad.py); forward numerics "
                        "unchanged, dW reduction-order drift only")
    p.add_argument("--freeze-bn", action="store_true", default=None,
                   help="train with BatchNorm frozen (eval-mode "
                        "normalization, running stats untouched) — the "
                        "standard fine-tune recipe with an imported "
                        "pretrained backbone, and a measured ~12%% "
                        "train-step saving; disables VGG-head dropout too "
                        "(model applied in eval mode)")


def _load_config(args, defaults):
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig

    if args.config:
        config = ExperimentConfig.load(args.config)
    else:
        config = ExperimentConfig(**defaults)
    for field, attr in [
        ("batch_size", "batch_size"), ("epochs", "epochs"),
        ("steps_per_epoch", "steps_per_epoch"),
        ("output_dir", "output_dir"),
        ("pretrained_weights", "pretrained_weights"),
        ("n_model_shards", "n_model_shards"),
        ("num_workers", "num_workers"),
        ("pallas_wgrad", "pallas_wgrad"),
        ("freeze_bn", "freeze_bn"),
    ]:
        v = getattr(args, attr, None)
        if v is not None:
            setattr(config, field, v)
    config.restart = bool(args.restart)
    return config


def _resume_or_create_run_dir(config) -> str:
    """`--restart` resumes the LATEST existing run of this workspace/project
    (the reference's restart semantics, `training.py:74-103`: it re-opens the
    most recent experiment dir and `fit()` restores its checkpoint) instead
    of creating a fresh dir whose empty checkpoints/ would silently train
    from scratch.  Falls back to a new run dir when none exists."""
    from jpeg_detection_resnet_ssd_tpu.train.config import (
        create_run_dir,
        find_latest_run,
    )

    if config.restart:
        existing = find_latest_run(config)
        if existing is not None:
            return existing
        print("restart requested but no prior run found; starting fresh",
              file=sys.stderr)
    return create_run_dir(config)


def _resolve_pretrained_source(spec: str) -> str:
    """`--pretrained-weights` accepts a local H5 path, a known-checkpoint
    short name (checksum-verified fetch, `compat/fetch.py`), or a URL with
    an optional `#md5:<hex>` / `#sha256:<hex>` fragment."""
    from jpeg_detection_resnet_ssd_tpu.compat.fetch import (
        KNOWN_WEIGHTS,
        fetch_known_weights,
        fetch_weights,
    )

    if spec in KNOWN_WEIGHTS:
        return fetch_known_weights(spec)
    if "://" in spec:
        origin, _, checksum = spec.partition("#")
        return fetch_weights(origin, checksum=checksum or None)
    return spec


def _maybe_import_pretrained(config, trainer, example_inputs):
    import jax

    from jpeg_detection_resnet_ssd_tpu.compat import import_weights_by_name

    if not config.pretrained_weights:
        return None
    config.pretrained_weights = _resolve_pretrained_source(
        config.pretrained_weights
    )
    from jpeg_detection_resnet_ssd_tpu.models import build_model

    module, _ = build_model(config.model, **config.model_kwargs)
    variables = module.init(
        jax.random.PRNGKey(config.seed), example_inputs(), train=False
    )
    variables, report = import_weights_by_name(
        variables, config.pretrained_weights, verbose=True
    )
    return variables


def _check_device_augment_flags(args, config):
    """The DCT-domain device-augmentation paths only exist for the dual-plane
    'dct' input contract.  Silently falling back to the host pipeline would
    train a different recipe than the user asked for — fail loud instead
    (ADVICE.md round 2)."""
    device_augment = getattr(args, "device_augment", False)
    pack_cache = getattr(args, "pack_cache", None)
    if device_augment and config.input_format != "dct":
        raise SystemExit(
            f"--device-augment requires input_format='dct' (dual-plane "
            f"Y+CbCr coefficients); this run resolves to input_format="
            f"{config.input_format!r} (archi={args.archi!r}). Drop the flag "
            f"to use the host augmentation pipeline, or pick a dct archi."
        )
    if pack_cache and not device_augment:
        raise SystemExit(
            "--pack-cache only takes effect together with --device-augment "
            "(the packed corpus stores oversized DCT coefficients for the "
            "device augmentation chain). Add --device-augment or drop "
            "--pack-cache."
        )


def cmd_train_classify(args):
    from jpeg_detection_resnet_ssd_tpu.data import (
        ClassificationPipeline,
        ImageFolderDataset,
    )
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer, fit

    archi = args.archi or "late_concat_rfa_thinner"
    model = "resnet50_rgb" if archi == "rgb" else f"resnet50_dct_{archi}"
    input_format = (
        "rgb" if archi == "rgb"
        else "dct_deconv" if archi == "deconv" else "dct"
    )
    config = _load_config(
        args,
        dict(
            model=model, task="classification", input_format=input_format,
            model_kwargs={"num_classes": 1000},
            learning_rate=0.1, nesterov=True, lr_decay=1e-4,
            l2_regularization=0.0, batch_size=256, epochs=120,
            steps_per_epoch=5000, warmup_epochs=5,
        ),
    )
    ds = ImageFolderDataset(args.train_dir, args.class_index_json)
    import jax

    full_ds = ds  # unsharded: pack caches must cover the whole corpus
    ds = ds.shard(jax.process_index(), jax.process_count())
    _check_device_augment_flags(args, config)
    augment_fn = None
    if getattr(args, "device_augment", False):
        # Device-side continuous random-resized-crop + flip + photometric
        # compiled into the train step; the host ships oversized 256px
        # coefficient maps (no re-encode).
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_classification_augment_v2,
        )

        augment_fn = make_dct_classification_augment_v2(out_y_blocks=28)
        if args.pack_cache:
            from jpeg_detection_resnet_ssd_tpu.data.packed import (
                PackedDctPipeline,
                load_or_create,
            )

            packed = load_or_create(
                args.pack_cache, full_ds, task="classification",
                img_size=256, num_workers=config.num_workers,
            )
            pipe = PackedDctPipeline(
                packed, config.batch_size,
                train=True, seed=config.seed, ship_dtype="int16",
                shard_index=jax.process_index(),
                shard_count=jax.process_count(),
            )
        else:
            # host does NO pixel augment (deterministic 256px eval view);
            # epoch shuffling stays on, crops/flips happen on device
            pipe = ClassificationPipeline(
                ds, config.batch_size, train=True, host_augment=False,
                input_format="dct", image_size=256,
                num_workers=config.num_workers, seed=config.seed,
            )
    else:
        pipe = ClassificationPipeline(
            ds, config.batch_size, train=True,
            input_format=config.input_format, num_workers=config.num_workers,
            seed=config.seed,
        )
    run_dir = _resume_or_create_run_dir(config)
    print(f"run dir: {run_dir}")
    trainer, module, example_inputs = build_trainer(
        config, augment_fn=augment_fn
    )
    init_vars = _maybe_import_pretrained(config, trainer, example_inputs)
    state, history = fit(
        config, pipe, run_dir=run_dir, max_steps=args.max_steps,
        init_variables=init_vars, mesh=trainer.mesh, augment_fn=augment_fn,
        steps_per_call=args.steps_per_call,
    )
    print(json.dumps(history[-1] if history else {}))


def cmd_train_detect(args):
    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
    from jpeg_detection_resnet_ssd_tpu.data import (
        DetectionDataset,
        DetectionPipeline,
    )
    from jpeg_detection_resnet_ssd_tpu.data.augment import SSDDataAugmentation
    from jpeg_detection_resnet_ssd_tpu.models import ssd_predictor_sizes
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer, fit

    archi = args.archi or "ssd_custom"
    model = f"ssd300_{archi}" if not args.vgg else "ssd300_vgg_dct"
    family = "resnet_custom" if archi == "ssd_custom" else "resnet_identical"
    if args.vgg:
        family = "vgg_dct"
    input_format = "dct_deconv" if archi == "deconv" and not args.vgg else "dct"
    config = _load_config(
        args,
        dict(
            model=model, task="detection", input_format=input_format,
            model_kwargs={"n_classes": 20},
            learning_rate=1e-3,
            l2_regularization=5e-4 if args.reg else 0.0,
            batch_size=32, epochs=480, steps_per_epoch=1000,
        ),
    )
    sets = []
    for root in args.voc_root:
        name = "trainval.txt"
        sets.append(
            (
                os.path.join(root, "JPEGImages"),
                os.path.join(root, "ImageSets", "Main", name),
                os.path.join(root, "Annotations"),
            )
        )
    ds = DetectionDataset.from_voc(
        [s[0] for s in sets], [s[1] for s in sets], [s[2] for s in sets]
    )
    import jax

    full_ds = ds  # unsharded: pack caches must cover the whole corpus
    ds = ds.shard(jax.process_index(), jax.process_count())
    encoder = TargetEncoder(
        spec=AnchorSpec(),
        predictor_sizes=ssd_predictor_sizes(family),
        n_classes=20,
    )
    _check_device_augment_flags(args, config)
    augment_fn = None
    if args.device_augment:
        # North-star path: host resizes to a 352px (44-block) source frame;
        # the FULL augmentation chain — DCT-domain photometric, continuous
        # U(1,4) expand + min-IoU U(0.3,1) crop + bilinear resize (one linear
        # coefficient-space op), hflip — plus GT rewrite and target encode
        # all run INSIDE the compiled train step (ops/dct_detect_augment.py
        # v3, mirror of the reference's SSDDataAugmentation chain; held-out
        # A/B vs the host chain in BENCHMARK.md).
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_detection_augment_v3,
        )

        encoder = TargetEncoder(
            spec=AnchorSpec(img_height=304, img_width=304),
            predictor_sizes=ssd_predictor_sizes(family),
            n_classes=20,
        )
        augment_fn = make_dct_detection_augment_v3(
            out_y_blocks=38,
            expand_prob=0.5 if args.crop else 0.0,
            scale_range=(0.3, 1.0) if args.crop else (1.0, 1.0),
            photometric=(
                "pixel_hsv"
                if getattr(args, "photometric", "dct") == "pixel" else True
            ),
            requantize_quality=getattr(args, "requantize", None),
        )
        if args.pack_cache:
            # Decode-once corpus: epochs read memmapped coefficient tensors
            # at memory speed instead of re-decoding JPEGs (data/packed.py).
            from jpeg_detection_resnet_ssd_tpu.data.packed import (
                PackedDctPipeline,
                load_or_create,
            )

            packed = load_or_create(
                args.pack_cache, full_ds, task="detection",
                img_height=352, img_width=352,
                num_workers=config.num_workers,
            )
            pipe = PackedDctPipeline(
                packed, config.batch_size,
                train=True, seed=config.seed, ship_dtype="int16",
                shard_index=jax.process_index(),
                shard_count=jax.process_count(),
            )
        else:
            pipe = DetectionPipeline(
                ds, config.batch_size, train=True, encoder=encoder,
                augmentation=None, img_height=352, img_width=352,
                input_format=config.input_format,
                num_workers=config.num_workers, seed=config.seed,
                device_encode=True,
            )
    else:
        augmentation = SSDDataAugmentation(crop=args.crop)
        # device_encode: ship raw padded GT; target encoding fuses into the
        # compiled train step (minimal host->device transfer).
        pipe = DetectionPipeline(
            ds, config.batch_size, train=True, encoder=encoder,
            augmentation=augmentation, input_format=config.input_format,
            num_workers=config.num_workers, seed=config.seed,
            device_encode=True,
        )
    run_dir = _resume_or_create_run_dir(config)
    print(f"run dir: {run_dir}")
    trainer, module, example_inputs = build_trainer(
        config, target_encoder=encoder.encode_fn, augment_fn=augment_fn
    )
    val_fn = None
    if args.val_image_set:
        from jpeg_detection_resnet_ssd_tpu.train.loop import make_validation_fn

        val_root = args.voc_root[0]
        val_ds = DetectionDataset.from_voc(
            os.path.join(val_root, "JPEGImages"),
            os.path.join(val_root, "ImageSets", "Main", args.val_image_set),
            os.path.join(val_root, "Annotations"),
        )
        val_pipe = DetectionPipeline(
            val_ds, config.batch_size, train=False, encoder=encoder,
            augmentation=None, input_format=config.input_format,
            num_workers=config.num_workers, device_encode=True,
            drop_remainder=True,
        )
        val_fn = make_validation_fn(trainer, val_pipe)
    init_vars = _maybe_import_pretrained(config, trainer, example_inputs)
    state, history = fit(
        config, pipe, val_fn=val_fn, run_dir=run_dir,
        max_steps=args.max_steps, init_variables=init_vars,
        mesh=trainer.mesh, target_encoder=encoder.encode_fn,
        augment_fn=augment_fn, steps_per_call=args.steps_per_call,
    )
    print(json.dumps(history[-1] if history else {}))


def cmd_evaluate(args):
    import jax

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.data import (
        DetectionDataset,
        DetectionPipeline,
    )
    from jpeg_detection_resnet_ssd_tpu.eval import (
        DetectionEvaluator,
        write_voc_detection_files,
    )
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        make_inference_fn,
    )
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer

    config = ExperimentConfig.load(
        os.path.join(args.run_dir, "saved_config.json")
    )
    trainer, module, example_inputs = build_trainer(config)
    from jpeg_detection_resnet_ssd_tpu.train.checkpoints import (
        CheckpointManager,
    )

    with trainer.mesh:
        if args.exported:
            # mAP straight from an AOT serving artifact: proves the exported
            # graph is production-equivalent to the in-process path. Export
            # with --candidate-selector exact --batch-size <this batch size>
            # (or --symbolic-batch) for the literal reference protocol.
            from jpeg_detection_resnet_ssd_tpu.serve import (
                load_serving_artifact,
            )

            exported_fn, manifest = load_serving_artifact(args.exported)
            # A fixed-batch artifact bakes the leading dim into its
            # signature, but the eval pipeline keeps the final partial
            # batch (drop_remainder=False) — pad it up to the baked batch
            # and trim the decoded rows back, instead of crashing mid-run
            # on e.g. VOC07-test's 4952 % 32 tail.
            fixed_b = (
                None if manifest.get("symbolic_batch")
                else manifest["inputs"][0]["shape"][0]
            )

            def infer(inputs):
                import numpy as np

                inputs = inputs if isinstance(inputs, tuple) else (inputs,)
                n = int(inputs[0].shape[0])
                if fixed_b is None or n == fixed_b:
                    return exported_fn(*inputs)
                if n > fixed_b:
                    raise ValueError(
                        f"--batch-size {n} exceeds the artifact's baked "
                        f"batch {fixed_b}; re-export with --symbolic-batch "
                        f"or a larger --batch-size"
                    )
                padded = tuple(
                    np.concatenate(
                        [np.asarray(x),
                         np.zeros((fixed_b - n,) + tuple(x.shape[1:]),
                                  np.asarray(x).dtype)]
                    )
                    for x in inputs
                )
                return np.asarray(exported_fn(*padded))[:n]
        else:
            state = trainer.init_state(
                jax.random.PRNGKey(0), example_inputs()
            )
            ckpt = CheckpointManager(
                os.path.join(args.run_dir, "checkpoints")
            )
            state = ckpt.restore(state)

            # mAP protocol: literal reference semantics (full per-class
            # top-k), not the faster shared candidate pool used for serving.
            decode = make_inference_fn(
                n_classes=20, spec=AnchorSpec(), candidate_selector="exact"
            )

            @jax.jit
            def infer(inputs):
                variables = {
                    "params": state.params, "batch_stats": state.batch_stats
                }
                return decode(module.apply(variables, inputs, train=False))

        ds = DetectionDataset.from_voc(
            os.path.join(args.voc_root, "JPEGImages"),
            os.path.join(args.voc_root, "ImageSets", "Main", args.image_set),
            os.path.join(args.voc_root, "Annotations"),
        )
        pipe = DetectionPipeline(
            ds, args.batch_size, train=False, encoder=None,
            input_format=config.input_format, num_workers=config.num_workers,
        )
        ev = DetectionEvaluator(infer, pipe, n_classes=20)
        if args.predict_only:
            # Test-server sets without annotations (`evaluation.py:225-232`):
            # run inference + write VOC files, skip matching/mAP.
            ev.predict_on_dataset()
            mean_ap, aps = None, []
        else:
            mean_ap, aps, _ = ev(
                average_precision_mode=args.ap_mode,
                # --reference-iou reproduces the reference evaluator's mixed
                # matching IoU (intersection at 'half' under 'include' box
                # areas — its iou() drops border_pixels on the intersection,
                # bounding_box_utils.py:348) for digit-exact parity with its
                # published mAP tables; default is the official consistent
                # +1px convention.
                intersection_border="half" if args.reference_iou else None,
            )
    if args.out_dir:
        write_voc_detection_files(ev.prediction_results, args.out_dir)
    if args.predict_only:
        n_preds = sum(len(p) for p in ev.prediction_results)
        print(json.dumps({"predictions": n_preds, "out_dir": args.out_dir}))
    else:
        print(json.dumps({"mAP": mean_ap, "AP": aps[1:]}))


def cmd_evaluate_classify(args):
    """ImageNet-style top-1/top-5 evaluation of a classification run
    (role of `classification_part/evaluate.py`)."""
    import jax

    from jpeg_detection_resnet_ssd_tpu.data import (
        ClassificationPipeline,
        ImageFolderDataset,
    )
    from jpeg_detection_resnet_ssd_tpu.eval import ClassificationEvaluator
    from jpeg_detection_resnet_ssd_tpu.train.checkpoints import CheckpointManager
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer

    config = ExperimentConfig.load(
        os.path.join(args.run_dir, "saved_config.json")
    )
    trainer, module, example_inputs = build_trainer(config)
    with trainer.mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), example_inputs())
        ckpt = CheckpointManager(os.path.join(args.run_dir, "checkpoints"))
        state = ckpt.restore(state)

        @jax.jit
        def infer(inputs):
            variables = {
                "params": state.params, "batch_stats": state.batch_stats
            }
            return module.apply(variables, inputs, train=False)

        ds = ImageFolderDataset(args.val_dir, args.class_index_json)
        pipe = ClassificationPipeline(
            ds, args.batch_size, train=False,
            input_format=config.input_format,
            num_workers=config.num_workers, drop_remainder=True,
        )
        result = ClassificationEvaluator(infer, pipe)()
    print(json.dumps(result))


def cmd_compute_map(args):
    """Offline mAP from VOC-format txt predictions + XML ground truth
    (role of `localisation_part/compute_map.py`)."""
    from jpeg_detection_resnet_ssd_tpu.data import parse_voc_xml
    from jpeg_detection_resnet_ssd_tpu.eval import (
        average_precision,
        match_predictions,
        num_gt_per_class,
        read_voc_detection_files,
    )
    from jpeg_detection_resnet_ssd_tpu.eval.map_eval import precision_recall

    preds = read_voc_detection_files(args.pred_dir)
    recs = parse_voc_xml(
        os.path.join(args.voc_root, "JPEGImages"),
        os.path.join(args.voc_root, "ImageSets", "Main", args.image_set),
        os.path.join(args.voc_root, "Annotations"),
    )
    gt = {
        str(r["image_id"]): (r["boxes"].astype(float), r["difficult"])
        for r in recs
    }
    n_gt = num_gt_per_class(gt, 20)
    cum_tp, cum_fp = match_predictions(
        preds, gt, 20,
        intersection_border="half" if args.reference_iou else None,
    )
    aps = []
    for c in range(1, 21):
        prec, rec = precision_recall(cum_tp[c], cum_fp[c], int(n_gt[c]))
        aps.append(average_precision(prec, rec, args.ap_mode))
    print(json.dumps({"mAP": sum(aps) / 20, "AP": aps}))


def cmd_infer(args):
    """Single-image detection demo (role of `localisation_part/inference.py`):
    decode -> DCT tensors -> flagship model -> draw boxes -> save PNG."""
    import jax
    import numpy as np
    from PIL import Image, ImageDraw

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.data.augment import resize, to_3_channels
    from jpeg_detection_resnet_ssd_tpu.data.datasets import VOC_CLASSES
    from jpeg_detection_resnet_ssd_tpu.data.dct_convert import rgb_to_dct_tensors
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        make_inference_fn,
    )

    module, _ = build_model(args.model, n_classes=20)
    with Image.open(args.image) as im:
        orig = np.asarray(im.convert("RGB"))
    img300, _, inverter = resize(
        to_3_channels(orig), np.zeros((0, 5), np.float32), 300, 300,
        return_inverter=True,
    )
    y, cbcr = rgb_to_dct_tensors(img300)
    inputs = (y[None].astype(np.float32), cbcr[None].astype(np.float32))
    if args.exported:
        # AOT serving artifact: no model-building code, weights baked in.
        from jpeg_detection_resnet_ssd_tpu.serve import load_serving_artifact

        fn, manifest = load_serving_artifact(args.exported)
        if not manifest.get("symbolic_batch"):
            b = manifest["inputs"][0]["shape"][0]
            inputs = tuple(np.repeat(x, b, axis=0) for x in inputs)
        out = np.asarray(fn(*inputs))[0]
    else:
        variables = module.init(jax.random.PRNGKey(0), inputs, train=False)
        if args.weights:
            from jpeg_detection_resnet_ssd_tpu.compat import (
                import_weights_by_name,
            )

            variables, _ = import_weights_by_name(variables, args.weights,
                                                  verbose=True)
        decode = make_inference_fn(n_classes=20, spec=AnchorSpec())
        out = np.asarray(
            jax.jit(lambda v, i: decode(module.apply(v, i, train=False)))(
                variables, inputs
            )
        )[0]
    rows = out[out[:, 1] >= args.confidence]
    rows = rows[np.isfinite(rows).all(axis=1)]
    rows = inverter(rows) if len(rows) else rows
    im = Image.fromarray(orig)
    draw = ImageDraw.Draw(im)
    H, W = orig.shape[:2]
    for row in rows:
        cls, conf, xmin, ymin, xmax, ymax = row
        xmin, xmax = np.clip([xmin, xmax], 0, W - 1)
        ymin, ymax = np.clip([ymin, ymax], 0, H - 1)
        if xmax <= xmin or ymax <= ymin:
            continue
        draw.rectangle([xmin, ymin, xmax, ymax], outline=(255, 0, 0), width=2)
        draw.text(
            (xmin + 2, max(0, ymin - 12)),
            f"{VOC_CLASSES[int(cls) - 1]}:{conf:.2f}",
            fill=(255, 0, 0),
        )
    im.save(args.output)
    print(f"{len(rows)} detections -> {args.output}")


def cmd_export(args):
    """AOT-export a serving artifact (StableHLO, weights baked in).

    Source is either a training run (`--run-dir`, restores the checkpoint
    like `evaluate`) or a fresh model (`--model`, optionally `--weights` H5).
    Detection models export forward + decode to (B, top_k, 6) detections;
    classification models export logits.  See `serve/export.py`.
    """
    import jax
    import numpy as np

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        make_inference_fn,
    )
    from jpeg_detection_resnet_ssd_tpu.serve import (
        build_serving_fn,
        export_serving_artifact,
    )

    if args.run_dir:
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
            state = trainer.init_state(
                jax.random.PRNGKey(0), example_inputs()
            )
            state = CheckpointManager(
                os.path.join(args.run_dir, "checkpoints")
            ).restore(state)
        variables = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        model_name, task = config.model, config.task
    else:
        # Detection factories take n_classes; classification factories do
        # not (they default to 1000 ImageNet classes) — passing n_classes
        # to e.g. resnet50_dct_deconv is a TypeError.
        if args.model.startswith("ssd300"):
            module, example_inputs = build_model(args.model, n_classes=20)
        else:
            module, example_inputs = build_model(args.model)
        variables = module.init(
            jax.random.PRNGKey(0), example_inputs(), train=False
        )
        if args.weights:
            from jpeg_detection_resnet_ssd_tpu.compat import (
                import_weights_by_name,
            )

            variables, _ = import_weights_by_name(variables, args.weights)
        model_name = args.model
        task = "detection" if model_name.startswith("ssd300") else (
            "classification"
        )

    decode = None
    if task == "detection":
        # nms_impl defaults to the portable XLA path so one artifact can
        # carry both cpu and tpu lowerings; pass --nms-impl pallas to pin
        # the TPU kernel into a tpu-only artifact.
        decode = make_inference_fn(
            n_classes=20, spec=AnchorSpec(),
            confidence_thresh=args.confidence, top_k=args.top_k,
            nms_impl=args.nms_impl,
            candidate_selector=args.candidate_selector,
        )
    if args.quantize == "int8":
        import jax.numpy as jnp

        from jpeg_detection_resnet_ssd_tpu.serve import quantize_for_serving

        if args.calib_voc_root:
            from jpeg_detection_resnet_ssd_tpu.data import (
                DetectionDataset,
                DetectionPipeline,
            )

            ds = DetectionDataset.from_voc(
                os.path.join(args.calib_voc_root, "JPEGImages"),
                os.path.join(args.calib_voc_root, "ImageSets", "Main",
                             args.calib_image_set),
                os.path.join(args.calib_voc_root, "Annotations"),
            )
            pipe = DetectionPipeline(
                ds, args.batch_size, train=False, encoder=None,
                num_workers=2,
            )
            calib = []
            for batch in pipe:
                calib.append(batch["inputs"])
                if len(calib) >= args.calib_batches:
                    break
        else:
            print("warning: int8 calibration on synthetic example inputs; "
                  "pass --calib-voc-root for real activation ranges",
                  file=sys.stderr)
            ex = example_inputs()
            calib = [ex]
        qfn, qinfo = quantize_for_serving(
            module, variables, calib, fold_bn=not args.no_fold_bn
        )
        print(json.dumps({"quantized_convs": len(qinfo["quantized"]),
                          "kept_float": qinfo["kept_float"]}),
              file=sys.stderr)
        if decode is None:
            serving_fn = qfn
        else:
            def serving_fn(*inputs):
                return decode(qfn(*inputs).astype(jnp.float32))
    else:
        serving_fn = build_serving_fn(
            module, variables, decode_fn=decode, fold_bn=not args.no_fold_bn
        )

    example = example_inputs()
    example = example if isinstance(example, tuple) else (example,)
    inputs = tuple(
        np.zeros((args.batch_size,) + x.shape[1:], x.dtype) for x in example
    )
    manifest = export_serving_artifact(
        serving_fn, inputs, args.output,
        platforms=args.platforms.split(",") if args.platforms else None,
        symbolic_batch=args.symbolic_batch,
        manifest_extra={
            "model": model_name,
            "task": task,
            "fold_bn": not args.no_fold_bn,
            "quantize": args.quantize,
            "decode": None if decode is None else {
                "confidence_thresh": args.confidence,
                "top_k": args.top_k,
                "nms_impl": args.nms_impl,
                "candidate_selector": args.candidate_selector,
            },
        },
    )
    print(json.dumps({
        "output": args.output, "bytes": manifest["bytes"],
        "platforms": manifest["platforms"],
        "inputs": manifest["inputs"],
    }))


def cmd_bench(args):
    """Throughput + param-count harness (role of `inference_time.py`).

    Uses the chained-execution + host-readback protocol (see BENCHMARK.md
    "measurement integrity") so numbers are honest on relay-tunneled TPUs.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jpeg_detection_resnet_ssd_tpu.eval.imagenet_eval import count_params
    from jpeg_detection_resnet_ssd_tpu.models import build_model

    kwargs = {}
    if args.model.startswith("ssd300"):
        kwargs["n_classes"] = 20
    else:
        kwargs["num_classes"] = 1000
    module, example = build_model(args.model, **kwargs)
    inputs = example()

    def _batchify(x):
        reps = [args.batch_size] + [1] * (x.ndim - 1)
        return np.tile(x[:1], reps)

    inputs = jax.tree_util.tree_map(_batchify, inputs)
    variables = module.init(jax.random.PRNGKey(0), inputs, train=False)
    leaves = jax.tree_util.tree_leaves(inputs)
    chain_n = args.runs

    @jax.jit
    def chained(v, *ins):
        first = ins[0]

        def body(carry, _):
            acc, x0 = carry
            cur = (x0,) + tuple(ins[1:])
            cur = cur if len(leaves) > 1 else (x0,)
            out = module.apply(v, cur if len(leaves) > 1 else cur[0],
                               train=False)
            ds = jnp.sum(out).astype(jnp.float32) * 1e-12
            return (acc + ds, first + ds * 1e-9), None

        (acc, _), _ = jax.lax.scan(body, (0.0, first), None, length=chain_n)
        return acc

    import time as _time

    float(chained(variables, *leaves))  # compile
    best = 0.0
    for _ in range(3):
        t0 = _time.perf_counter()
        float(chained(variables, *leaves))
        best = max(best, args.batch_size * chain_n / (_time.perf_counter() - t0))
    result = {
        "model": args.model,
        "params": count_params(variables["params"]),
        "batch_size": args.batch_size,
        "images_per_sec": round(best, 1),
    }
    print(json.dumps(result))


def build_parser():
    p = argparse.ArgumentParser(prog="jpeg-dct-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    tc = sub.add_parser("train-classify")
    _add_train_common(tc)
    tc.add_argument("--train-dir", required=True)
    tc.add_argument("--class-index-json", default=None)
    tc.add_argument("--device-augment", action="store_true",
                    help="DCT-domain crop/flip/photometric inside the "
                         "compiled train step (256px host source, 224px "
                         "device crops; recompression-free)")
    tc.add_argument("--pack-cache", default=None,
                    help="with --device-augment: stem path for a decode-once "
                         "memmapped DCT corpus (created if absent)")
    tc.set_defaults(fn=cmd_train_classify)

    td = sub.add_parser("train-detect")
    _add_train_common(td)
    td.add_argument("--voc-root", nargs="+", required=True)
    td.add_argument("--crop", dest="crop", action="store_true", default=True)
    td.add_argument("--no_crop", dest="crop", action="store_false")
    td.add_argument("--reg", dest="reg", action="store_true", default=True)
    td.add_argument("--no_reg", dest="reg", action="store_false")
    td.add_argument("--vgg", action="store_true",
                    help="VGG-DCT backbone instead of ResNet")
    td.add_argument("--device-augment", action="store_true",
                    help="full DCT-domain augmentation chain (photometric + "
                         "expand + min-IoU crop + flip) + encode inside the "
                         "compiled train step (recompression-free fast path)")
    td.add_argument("--pack-cache", default=None,
                    help="with --device-augment: stem path for a decode-once "
                         "memmapped DCT corpus (created if absent); lifts the "
                         "host JPEG-decode ceiling for repeated epochs")
    td.add_argument("--photometric", default="dct",
                    choices=["dct", "pixel"],
                    help="with --device-augment: 'dct' = coefficient-domain "
                         "photometric (chroma-rotation hue/sat, fastest); "
                         "'pixel' = exact reference HSV semantics via "
                         "on-device pixel reconstruction "
                         "(ops/pixel_photometric.py)")
    td.add_argument("--requantize", default=None, type=int, metavar="Q",
                    help="with --device-augment: snap each augmented view's "
                         "coefficients to the JPEG quality-Q quantization "
                         "grid (ops/jpeg_quant.py) — reproduces the host "
                         "chain's per-view re-encode quantization")
    td.add_argument("--val-image-set", default=None,
                    help="ImageSets/Main/<file> for per-epoch validation "
                         "loss (e.g. val.txt)")
    td.set_defaults(fn=cmd_train_detect)

    ev = sub.add_parser("evaluate")
    ev.add_argument("--run-dir", required=True)
    ev.add_argument("--voc-root", required=True)
    ev.add_argument("--image-set", default="test.txt")
    ev.add_argument("--batch-size", type=int, default=8)
    ev.add_argument("--ap-mode", default="integrate",
                    choices=["integrate", "sample"])
    ev.add_argument("--out-dir", default=None)
    ev.add_argument("--predict-only", action="store_true",
                    help="write predictions without computing mAP "
                         "(for annotation-less test sets)")
    ev.add_argument("--reference-iou", action="store_true",
                    help="match with the reference evaluator's mixed IoU "
                         "formula (its iou() computes the intersection with "
                         "'half' borders even under 'include') for "
                         "digit-exact parity with its published mAP tables; "
                         "default: the official consistent +1px convention")
    ev.add_argument("--exported", default=None,
                    help="serving-artifact dir from `export`: compute mAP "
                         "from the AOT artifact instead of the checkpoint "
                         "(export with --candidate-selector exact and "
                         "--symbolic-batch for the reference protocol)")
    ev.set_defaults(fn=cmd_evaluate)

    ec = sub.add_parser("evaluate-classify")
    ec.add_argument("--run-dir", required=True)
    ec.add_argument("--val-dir", required=True)
    ec.add_argument("--class-index-json", default=None)
    ec.add_argument("--batch-size", type=int, default=64)
    ec.set_defaults(fn=cmd_evaluate_classify)

    cm = sub.add_parser("compute-map")
    cm.add_argument("--pred-dir", required=True)
    cm.add_argument("--voc-root", required=True)
    cm.add_argument("--image-set", default="test.txt")
    cm.add_argument("--ap-mode", default="sample",
                    choices=["integrate", "sample"])
    cm.add_argument("--reference-iou", action="store_true",
                    help="same as evaluate --reference-iou (the reference's "
                         "mixed matching IoU)")
    cm.set_defaults(fn=cmd_compute_map)

    inf = sub.add_parser("infer")
    inf.add_argument("--image", required=True)
    inf.add_argument("--model", default="ssd300_ssd_custom")
    inf.add_argument("--weights", default=None)
    inf.add_argument("--exported", default=None,
                     help="serving-artifact dir from `export` (bypasses "
                          "model build; weights come from the artifact)")
    inf.add_argument("--confidence", type=float, default=0.2)
    inf.add_argument("--output", default="detections.png")
    inf.set_defaults(fn=cmd_infer)

    ex = sub.add_parser("export")
    src = ex.add_mutually_exclusive_group(required=True)
    src.add_argument("--run-dir", default=None,
                     help="training run to export (restores the checkpoint)")
    src.add_argument("--model", default=None,
                     help="registry model name (fresh init; combine with "
                          "--weights for a Keras H5)")
    ex.add_argument("--weights", default=None)
    ex.add_argument("--output", required=True, help="artifact directory")
    ex.add_argument("--batch-size", type=int, default=32)
    ex.add_argument("--symbolic-batch", action="store_true",
                    help="export with a symbolic batch dimension (one "
                         "artifact serves any batch size)")
    ex.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms, e.g. cpu,tpu "
                         "(default: the current backend only)")
    ex.add_argument("--no-fold-bn", action="store_true",
                    help="skip BatchNorm folding (kept for A/B checks)")
    ex.add_argument("--quantize", default=None, choices=["int8"],
                    help="post-training int8 trunk quantization "
                         "(serve/quantize.py): ~2x MXU rate, ~4x smaller "
                         "artifact; input stems + heads stay float")
    ex.add_argument("--calib-voc-root", default=None,
                    help="VOC root for activation-range calibration "
                         "(recommended with --quantize)")
    ex.add_argument("--calib-image-set", default="trainval.txt")
    ex.add_argument("--calib-batches", type=int, default=8)
    ex.add_argument("--confidence", type=float, default=0.01)
    ex.add_argument("--top-k", type=int, default=200)
    ex.add_argument("--nms-impl", default="xla",
                    choices=["xla", "pallas", "auto"])
    ex.add_argument("--candidate-selector", default="exact",
                    choices=["exact", "shared"])
    ex.set_defaults(fn=cmd_export)

    be = sub.add_parser("bench")
    be.add_argument("--model", default="ssd300_ssd_custom")
    be.add_argument("--batch-size", type=int, default=32)
    be.add_argument("--runs", type=int, default=10)
    be.set_defaults(fn=cmd_bench)

    return p


def main(argv=None):
    # JPEG_DCT_PLATFORM=cpu forces the CPU backend even where a site hook has
    # pre-registered an accelerator (useful for smoke runs and CI).
    platform = os.environ.get("JPEG_DCT_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    # Persistent XLA compilation cache: first-compile costs on TPU are
    # minutes-scale for some programs (the Pallas filter-grad kernel's
    # Mosaic compile measured ~9 min); caching makes them one-time per
    # machine instead of per run/restart.  JPEG_DCT_COMPILATION_CACHE
    # overrides the location; set it to '0' to disable.  CPU-only runs
    # skip the cache: XLA:CPU persists AOT machine code keyed WITHOUT the
    # host's CPU features, so a cache written on one VM can replay
    # SIGILL-prone code on another (observed: '+prefer-no-scatter is not
    # supported on the host machine' loader errors) — and CPU compiles are
    # local and cheap anyway.
    cache_dir = os.environ.get(
        "JPEG_DCT_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "jpeg_dct_xla"),
    )
    if cache_dir and cache_dir != "0" and platform != "cpu":
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
