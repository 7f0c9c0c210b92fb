"""ImageNet classification evaluation + inference timing harness.

Roles of `classification_part/vgg_jpeg_keras/evaluation/evaluators.py`
(`Evaluator.__call__`, `make_runs`) and `inference_time.py` (repeat-run timing
with param count), re-built on jitted batched apply.
"""

from __future__ import annotations

import time

import numpy as np


class ClassificationEvaluator:
    """Batched top-1/top-5 over a ClassificationPipeline."""

    def __init__(self, infer_fn, pipeline):
        """infer_fn: (inputs) -> (B, n_classes) logits (jitted)."""
        self.infer_fn = infer_fn
        self.pipeline = pipeline

    def __call__(self):
        import jax

        top1 = top5 = count = 0
        for batch in self.pipeline:
            logits = np.asarray(
                jax.block_until_ready(self.infer_fn(batch["inputs"]))
            )
            labels = np.asarray(batch["labels"])
            k = min(5, logits.shape[-1])
            topk = np.argsort(-logits, axis=-1)[:, :k]
            top1 += int((topk[:, 0] == labels).sum())
            top5 += int((topk == labels[:, None]).any(axis=1).sum())
            count += len(labels)
        return {
            "top1": top1 / max(count, 1),
            "top5": top5 / max(count, 1),
            "count": count,
        }


def timed_runs(fn, args, n_runs: int = 10, warmup: int = 2):
    """Mean/std wall-clock of `fn(*args)` over `n_runs` (role of
    `evaluators.make_runs` / `inference_time.py:41-46`)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "mean_s": float(np.mean(times)),
        "std_s": float(np.std(times)),
        "runs": n_runs,
    }


def count_params(params) -> int:
    """`model.count_params()` equivalent (`inference_time.py:41`)."""
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
