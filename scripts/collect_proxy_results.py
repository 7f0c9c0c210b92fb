"""Collect multi-seed convergence-proxy results into `results_proxy/`.

Reads the JSON result lines that `scripts/convergence_proxy.py` and
`scripts/cls_convergence_proxy.py` print (one per completed run — pass one
or more queue logs and/or .json files), groups them by variant, and writes:

  * `results_proxy/round3_runs.json` — every run, verbatim;
  * `results_proxy/round3_summary.json` — per-variant mean/std/min/max of
    the held-out exact-selector mAP, the shared-selector delta, and run
    counts (detection runs);
  * `results_proxy/round3_cls_summary.json` — per-variant held-out top-1
    statistics (classification runs), written only when such runs exist;

then prints markdown tables for BENCHMARK.md.

Retried runs (checkpoint `--resume` after a relay flap) can emit more than
one result line for the same (variant, seed, steps); the LAST line wins —
it is the one produced by the invocation that actually reached the step
budget.

Usage: python scripts/collect_proxy_results.py /tmp/proxy_r3/queue.log ...
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def load_runs(paths):
    runs = {}

    def add(r):
        key = (r["variant"], r.get("seed", -1), r["steps"],
               "heldout_mAP" in r)
        runs[key] = r  # last occurrence wins (resume retries)

    for p in paths:
        with open(p) as f:
            text = f.read()
        # A previously-written round3_runs.json is a pretty-printed JSON
        # array — accept it as input so collections can be merged
        # incrementally across queue logs that have since been deleted.
        stripped = text.lstrip()
        if stripped.startswith("["):
            for r in json.loads(stripped):
                add(r)
            continue
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith('{"variant"'):
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            add(r)
    return list(runs.values())


def summarize(rs_by_variant, metric):
    summary = {}
    for variant, rs in sorted(rs_by_variant.items()):
        vals = np.array([r[metric] for r in rs], np.float64)
        row = {
            "n_runs": len(rs),
            "seeds": sorted(r.get("seed", -1) for r in rs),
            "steps": sorted({r["steps"] for r in rs}),
            f"{metric}_mean": round(float(vals.mean()), 4),
            f"{metric}_std": round(float(vals.std(ddof=1)), 4)
            if len(rs) > 1 else None,
            f"{metric}_min": round(float(vals.min()), 4),
            f"{metric}_max": round(float(vals.max()), 4),
        }
        if metric == "heldout_mAP":
            deltas = np.array(
                [r.get("selector_delta", 0.0) for r in rs], np.float64
            )
            row["selector_delta_mean"] = round(float(deltas.mean()), 5)
            row["selector_delta_max_abs"] = round(
                float(np.abs(deltas).max()), 5
            )
        summary[variant] = row
    return summary


def print_table(summary, metric, label, extra_col=None):
    extra = f" {extra_col} |" if extra_col else ""
    print(f"| Variant | runs | {label} (mean ± std) | range |{extra}")
    print("|---|---|---|---|" + ("---|" if extra_col else ""))
    for variant, s in sorted(summary.items()):
        std = (f" ± {s[f'{metric}_std']:.3f}"
               if s[f"{metric}_std"] is not None else "")
        row = (
            f"| {variant} | {s['n_runs']} | "
            f"**{s[f'{metric}_mean']:.3f}**{std} | "
            f"[{s[f'{metric}_min']:.3f}, {s[f'{metric}_max']:.3f}] |"
        )
        if extra_col:
            row += (
                f" {s['selector_delta_mean']:+.5f} "
                f"(max |{s['selector_delta_max_abs']:.5f}|) |"
            )
        print(row)


def main():
    args = sys.argv[1:]
    # --steps N keeps only runs that reached N total steps in the summary
    # tables (round3_runs.json still records everything verbatim).  Needed
    # for two-phase queues (scripts/run_freezebn_proxy.sh): their phase-1
    # checkpoints emit a result line at an intermediate step count under
    # the SAME variant name, which would otherwise pollute that variant's
    # statistics.
    steps_filter = None
    if "--steps" in args:
        i = args.index("--steps")
        if i + 1 >= len(args):
            sys.exit("usage: collect_proxy_results.py [--steps N] [logs...]")
        try:
            steps_filter = int(args[i + 1])
        except ValueError:
            sys.exit(f"--steps expects an integer, got {args[i + 1]!r} "
                     "(usage: collect_proxy_results.py [--steps N] [logs...])")
        del args[i:i + 2]
    paths = args or ["/tmp/proxy_r3/queue.log"]
    runs = load_runs(paths)
    if not runs:
        sys.exit(f"no result lines found in {paths}")

    det, cls = {}, {}
    for r in runs:
        if steps_filter is not None and r["steps"] != steps_filter:
            continue
        group = det if "heldout_mAP" in r else cls
        group.setdefault(r["variant"], []).append(r)
    if steps_filter is not None and not det and not cls:
        sys.exit(
            f"no runs with steps=={steps_filter} (of {len(runs)} loaded); "
            "round3_runs.json not written — check the --steps value"
        )

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results_proxy",
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "round3_runs.json"), "w") as f:
        json.dump(runs, f, indent=1)
    written = ["round3_runs.json"]

    if det:
        summary = summarize(det, "heldout_mAP")
        with open(os.path.join(out_dir, "round3_summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        written.append("round3_summary.json")
        print_table(summary, "heldout_mAP", "held-out mAP",
                    extra_col="shared-selector delta")
    if cls:
        summary = summarize(cls, "heldout_top1")
        path = os.path.join(out_dir, "round3_cls_summary.json")
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        written.append("round3_cls_summary.json")
        if det:
            print()
        print_table(summary, "heldout_top1", "held-out top-1")

    print(f"\nwrote {', '.join(os.path.join(out_dir, w) for w in written)}")


if __name__ == "__main__":
    main()
