"""Collect multi-seed convergence-proxy results into `results_proxy/`.

Reads the JSON result lines that `scripts/convergence_proxy.py` prints
(one per completed run — pass one or more queue logs and/or .json files),
groups them by variant, and writes:

  * `results_proxy/round3_runs.json` — every run, verbatim;
  * `results_proxy/round3_summary.json` — per-variant mean/std/min/max of
    the held-out exact-selector mAP, the shared-selector delta, and run
    counts;

then prints a markdown table for BENCHMARK.md.

Usage: python scripts/collect_proxy_results.py /tmp/proxy_r3/queue.log ...
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def load_runs(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line.startswith('{"variant"'):
                    continue
                try:
                    runs.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return runs


def main():
    paths = sys.argv[1:] or ["/tmp/proxy_r3/queue.log"]
    runs = load_runs(paths)
    if not runs:
        sys.exit(f"no result lines found in {paths}")

    by_variant = {}
    for r in runs:
        by_variant.setdefault(r["variant"], []).append(r)

    summary = {}
    for variant, rs in sorted(by_variant.items()):
        maps = np.array([r["heldout_mAP"] for r in rs], np.float64)
        deltas = np.array(
            [r.get("selector_delta", 0.0) for r in rs], np.float64
        )
        summary[variant] = {
            "n_runs": len(rs),
            "seeds": sorted(r.get("seed", -1) for r in rs),
            "steps": sorted({r["steps"] for r in rs}),
            "heldout_mAP_mean": round(float(maps.mean()), 4),
            "heldout_mAP_std": round(float(maps.std(ddof=1)), 4)
            if len(rs) > 1 else None,
            "heldout_mAP_min": round(float(maps.min()), 4),
            "heldout_mAP_max": round(float(maps.max()), 4),
            "selector_delta_mean": round(float(deltas.mean()), 5),
            "selector_delta_max_abs": round(float(np.abs(deltas).max()), 5),
        }

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results_proxy",
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "round3_runs.json"), "w") as f:
        json.dump(runs, f, indent=1)
    with open(os.path.join(out_dir, "round3_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)

    print("| Variant | runs | held-out mAP (mean ± std) | range | "
          "shared-selector delta |")
    print("|---|---|---|---|---|")
    for variant, s in sorted(summary.items()):
        std = f" ± {s['heldout_mAP_std']:.3f}" if s["heldout_mAP_std"] \
            is not None else ""
        print(
            f"| {variant} | {s['n_runs']} | "
            f"**{s['heldout_mAP_mean']:.3f}**{std} | "
            f"[{s['heldout_mAP_min']:.3f}, {s['heldout_mAP_max']:.3f}] | "
            f"{s['selector_delta_mean']:+.5f} "
            f"(max |{s['selector_delta_max_abs']:.5f}|) |"
        )
    print(f"\nwrote {out_dir}/round3_runs.json and round3_summary.json")


if __name__ == "__main__":
    main()
