"""Benchmark: DCT-SSD300 (ssd_custom) end-to-end inference throughput on TPU.

Measures the flagship detector — forward pass + full in-graph decode (per-class
NMS + global top-k), i.e. the work the reference does in 'inference' mode
(`keras_ssd300_dct_j2d_resnet.py:884-896`) — in images/sec on one chip.

Baseline: the reference never publishes throughput (BASELINE.md).  We bound
the P100 reference at 100 images/sec: SSD300-class Keras/TF-1.8 graphs with
in-graph per-class NMS ran at ~40-70 FPS on a P100 in contemporary reports,
so 100 img/s is a generous upper bound for `vs_baseline` (values > 1.0 beat
the bound; the north-star is >= 5.0).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

P100_BASELINE_IMAGES_PER_SEC = 100.0
BATCH = 32
WARMUP = 3
ITERS = 20


def main():
    from jpeg_detection_resnet_ssd_tpu.boxes.anchors import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.models import build_model, make_inference_fn

    module, _ = build_model("ssd300_ssd_custom", n_classes=20)
    rng = np.random.default_rng(0)
    y = rng.normal(0, 100, (BATCH, 38, 38, 64)).astype(np.float32)
    cbcr = rng.normal(0, 30, (BATCH, 19, 19, 128)).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), (y[:1], cbcr[:1]), train=False)
    decode = make_inference_fn(n_classes=20, spec=AnchorSpec())

    @jax.jit
    def infer(variables, y, cbcr):
        preds = module.apply(variables, (y, cbcr), train=False)
        return decode(preds)

    # Warmup (includes compile)
    for _ in range(WARMUP):
        out = jax.block_until_ready(infer(variables, y, cbcr))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jax.block_until_ready(infer(variables, y, cbcr))
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt
    result = {
        "metric": "dct_ssd300_inference_throughput",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / P100_BASELINE_IMAGES_PER_SEC, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
