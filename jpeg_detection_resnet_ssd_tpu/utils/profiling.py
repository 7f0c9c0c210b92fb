"""Profiling: XLA trace capture + per-step timing.

The reference has no profiler (SURVEY.md §5.1) — its closest tools are a
TensorBoard callback and a repeat-run timing script (`inference_time.py`).
Here tracing is first-class: `profile_trace` wraps `jax.profiler` (the traces
open in XProf/TensorBoard and show per-op TPU timelines), and `StepTimer`
gives cheap steady-state steps/sec with compile-step exclusion.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Track per-step wall time; skips the first `skip` (compile) steps."""

    def __init__(self, skip: int = 1):
        self.skip = skip
        self._times: list[float] = []
        self._last: float | None = None
        self._seen = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._seen += 1
            if self._seen > self.skip:
                self._times.append(now - self._last)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    def steps_per_sec(self) -> float:
        m = self.mean_step_s
        return 1.0 / m if m == m and m > 0 else 0.0
