#!/usr/bin/env python
"""Round-5 byte-elimination experiment: does rematerialization WIN
throughput on the bandwidth-bound train step?

The measured roofline (BENCHMARK.md round 5) puts the flagship train step
at ~63 FLOP/byte against the chip's measured 291 FLOP/byte balance point
(190.7 TF/s matmul canary / 660 GB/s streaming canary): it is deep in the
bandwidth-bound regime.  `remat=True` (`models/resnet.py:55-72`) recomputes
each bottleneck branch on the backward instead of storing its
activations — classically a memory-for-FLOPs trade, but on a
bandwidth-bound program the un-stored activations are also un-MOVED bytes,
so remat can pay for its extra FLOPs with saved traffic.

A/B on the real chip, the bench slope protocol (both programs AOT-compiled
concurrently, then timed serially on a quiet chip).  One JSON line each.
"""

from __future__ import annotations

import json
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from jpeg_detection_resnet_ssd_tpu.utils.timing import slope_seconds_dynamic


def _flagship(remat: bool):
    import jax
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.models import build_model

    module, _ = build_model(
        "ssd300_ssd_custom", n_classes=20, dtype=jnp.bfloat16, remat=remat
    )
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 100, (bench.BATCH, 38, 38, 64)), jnp.float32)
    cbcr = jnp.asarray(
        rng.normal(0, 30, (bench.BATCH, 19, 19, 128)), jnp.float32
    )
    variables = module.init(
        jax.random.PRNGKey(0), (y[:1], cbcr[:1]), train=False
    )
    return module, variables, y, cbcr


def main():
    arms = {}

    def prepare(name, remat):
        module, variables, y, cbcr = _flagship(remat)
        (unit,) = bench.prep_train(module, variables, y, cbcr)
        return unit

    with ThreadPoolExecutor(max_workers=2) as pool:
        futures = {
            name: pool.submit(prepare, name, remat)
            for name, remat in [("baseline", False), ("remat", True)]
        }
        for name, fut in futures.items():
            arms[name] = fut.result()

    results = {}
    for name, (label, fn, n, _report) in arms.items():
        t = slope_seconds_dynamic(fn, n, trials=bench.TRIALS)
        results[name] = t
        print(json.dumps({
            "metric": f"train_step_{name}",
            "value": round(bench.BATCH / t, 2),
            "unit": "images/sec/chip",
            "ms_per_batch": round(t * 1e3, 2),
        }), flush=True)
    delta = results["baseline"] / results["remat"] - 1.0
    print(json.dumps({
        "metric": "remat_ab_speedup",
        "value": round(delta * 100, 2),
        "unit": "percent (positive = remat faster)",
    }), flush=True)


if __name__ == "__main__":
    main()
