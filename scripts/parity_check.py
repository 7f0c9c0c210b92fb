#!/usr/bin/env python
"""Bit-parity harness: run our model against reference Keras H5 weights.

For the BASELINE.json accuracy-parity goal: given a weights H5 produced by the
reference toolchain (or our `compat.export_keras_h5`) and an input image, run
the forward pass and report outputs — compare these against the reference
implementation's outputs on the same image/weights (run on its own stack) to
argue bit-level parity.

Usage:
  python scripts/parity_check.py --model ssd300_ssd_custom \
      --weights reference_weights.h5 --image dog.jpg [--decode]

Prints a JSON summary: import report, output tensor stats, and (with
--decode) the top detections.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ssd300_ssd_custom")
    p.add_argument("--weights", required=True)
    p.add_argument("--image", default=None,
                   help="JPEG input; synthetic DCT tensors when omitted")
    p.add_argument("--decode", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.compat import import_weights_by_name
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        make_inference_fn,
    )

    kwargs = (
        {"n_classes": 20} if args.model.startswith("ssd300")
        else {"num_classes": 1000}
    )
    module, example = build_model(args.model, **kwargs)

    if args.image:
        from jpeg_detection_resnet_ssd_tpu.data.augment import (
            resize,
            to_3_channels,
        )
        from jpeg_detection_resnet_ssd_tpu.data.dct_convert import (
            rgb_to_dct_tensors,
        )
        from PIL import Image

        size = 300 if args.model.startswith("ssd300") else 224
        with Image.open(args.image) as im:
            rgb = np.asarray(im.convert("RGB"))
        img, _ = resize(to_3_channels(rgb), None, size, size)
        y, cbcr = rgb_to_dct_tensors(img)
        inputs = (y[None].astype(np.float32), cbcr[None].astype(np.float32))
    else:
        inputs = example()

    variables = module.init(jax.random.PRNGKey(0), inputs, train=False)
    variables, report = import_weights_by_name(variables, args.weights)

    out = np.asarray(
        jax.jit(lambda v, i: module.apply(v, i, train=False))(variables, inputs)
    )
    summary = {
        "loaded": len(report["loaded"]),
        "skipped": report["skipped"],
        "mismatched": report["mismatched"],
        "output_shape": list(out.shape),
        "output_mean": float(out.mean()),
        "output_std": float(out.std()),
        "output_first8": out.reshape(-1)[:8].tolist(),
    }
    if args.decode and args.model.startswith("ssd300"):
        # bit-parity harness: literal reference semantics, not the faster
        # shared serving selector
        decode = make_inference_fn(
            n_classes=20, spec=AnchorSpec(),
            candidate_selector="exact", nms_impl="xla",
        )
        det = np.asarray(decode(out))[0]
        det = det[det[:, 1] > 0.2]
        summary["detections"] = det[:10].tolist()
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
