"""Benchmark: DCT-SSD300 (ssd_custom) end-to-end inference throughput on TPU.

Measures the flagship detector — forward pass + full in-graph decode (per-class
NMS + global top-k), i.e. the work the reference does in 'inference' mode
(`keras_ssd300_dct_j2d_resnet.py:884-896`) — in images/sec on one chip.

Methodology (important): N executions are CHAINED inside one jitted program
via a data dependency (each iteration's input is perturbed by the previous
output), and completion is forced by a host readback of the final scalar.
Plain `block_until_ready` loops over-report by >20x under this environment's
TPU relay (async acks) — see BENCHMARK.md "measurement integrity".

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
import jax.numpy as jnp
import numpy as np

P100_BASELINE_IMAGES_PER_SEC = 100.0
BATCH = 32
CHAIN = 20
TRIALS = 3


def main():
    from jpeg_detection_resnet_ssd_tpu.boxes.anchors import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.models import build_model, make_inference_fn

    # Production serving path: bfloat16 forward (params f32, compute bf16 —
    # convergence/accuracy equivalence pinned in tests), decode in f32 with
    # the Pallas NMS kernel + shared candidate pool (BENCHMARK.md).
    module, _ = build_model(
        "ssd300_ssd_custom", n_classes=20, dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    y = rng.normal(0, 100, (BATCH, 38, 38, 64)).astype(np.float32)
    cbcr = rng.normal(0, 30, (BATCH, 19, 19, 128)).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), (y[:1], cbcr[:1]), train=False)
    # Serving opts into the shared candidate pool explicitly (the library
    # default is the reference's literal 'exact' per-class selector).
    decode = make_inference_fn(
        n_classes=20, spec=AnchorSpec(), candidate_selector="shared"
    )

    @jax.jit
    def chained(variables, y, cbcr):
        def body(carry, _):
            acc, yy = carry
            preds = module.apply(variables, (yy, cbcr), train=False)
            out = decode(preds.astype(jnp.float32))
            ds = jnp.sum(out[:, :, 1])
            # Perturb the next input by the previous output: a true data
            # dependency, so the device must execute all CHAIN iterations.
            return (acc + ds, y + ds * 1e-9), None

        (acc, _), _ = jax.lax.scan(body, (0.0, y), None, length=CHAIN)
        return acc

    y_d = jax.device_put(y)
    cbcr_d = jax.device_put(cbcr)
    float(chained(variables, y_d, cbcr_d))  # compile + warm

    best = 0.0
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        val = float(chained(variables, y_d, cbcr_d))  # readback = completion
        dt = time.perf_counter() - t0
        best = max(best, BATCH * CHAIN / dt)
        assert np.isfinite(val)

    result = {
        "metric": "dct_ssd300_inference_throughput",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / P100_BASELINE_IMAGES_PER_SEC, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
