"""The slope-timing protocol (`utils/timing.py`) — the measurement layer
every benchmark number rests on, so its statistics are pinned here.

The relay environment produces two failure modes (BENCHMARK.md
"measurement integrity"): host stalls that ADD time, and rare too-fast
samples where a long chain returns in roughly the short chain's time.
These tests drive `slope_seconds` with deterministic fake chains (no real
device) and pin that:

  * the slope cancels a fixed per-dispatch cost exactly;
  * a too-fast (physically impossible) pair is REJECTED, not selected the
    way a best-of-min would;
  * one-sided stall noise is absorbed by the median;
  * all-corrupt input raises instead of returning garbage.
"""

from __future__ import annotations

import itertools

import pytest

from jpeg_detection_resnet_ssd_tpu.utils import timing


class _FakeClock:
    def __init__(self):
        self.now = 0.0

    def __call__(self):
        return self.now


def _fake_chains(monkeypatch, durations_by_length):
    """Install a fake perf_counter and a build_chained whose calls consume
    scripted durations: durations_by_length[n] is an iterator of seconds."""
    clock = _FakeClock()
    monkeypatch.setattr(timing.time, "perf_counter", clock)

    def build_chained(n):
        def run():
            clock.now += next(durations_by_length[n])
            return 0.0

        return run

    return build_chained


FIXED = 0.025  # the relay's fixed per-dispatch cost
PER_ITER = 0.001


def test_slope_cancels_fixed_dispatch_cost(monkeypatch):
    n = 10
    build = _fake_chains(monkeypatch, {
        n: itertools.repeat(FIXED + n * PER_ITER),
        4 * n: itertools.repeat(FIXED + 4 * n * PER_ITER),
    })
    t = timing.slope_seconds(build, n, trials=3)
    assert t == pytest.approx(PER_ITER, rel=1e-9)


def test_too_fast_long_chain_sample_is_rejected(monkeypatch):
    """One long-chain sample returns in the short chain's time (the
    observed relay pathology).  best-of-min would report ~0 per iteration;
    the paired-median protocol must reject that pair and still return the
    true slope."""
    n = 10
    short_t = FIXED + n * PER_ITER
    long_t = FIXED + 4 * n * PER_ITER
    build = _fake_chains(monkeypatch, {
        n: itertools.repeat(short_t),
        # warm, then pair1 corrupt (long == short: impossible), pair2+ honest
        4 * n: iter([long_t, short_t] + [long_t] * 10),
    })
    t = timing.slope_seconds(build, n, trials=3)
    assert t == pytest.approx(PER_ITER, rel=1e-9)


def test_median_absorbs_one_sided_stall(monkeypatch):
    """A host stall inflates ONE long-chain sample 5x; the median over 3
    valid pairs must still report the honest slope."""
    n = 10
    short_t = FIXED + n * PER_ITER
    long_t = FIXED + 4 * n * PER_ITER
    build = _fake_chains(monkeypatch, {
        n: itertools.repeat(short_t),
        4 * n: iter([long_t, long_t, 5 * long_t, long_t] + [long_t] * 10),
    })
    t = timing.slope_seconds(build, n, trials=3)
    assert t == pytest.approx(PER_ITER, rel=1e-9)


def test_all_corrupt_pairs_raise(monkeypatch):
    """If the long chain NEVER measures slower than the short chain the
    protocol must refuse to report a number."""
    n = 10
    t_same = FIXED + n * PER_ITER
    build = _fake_chains(monkeypatch, {
        n: itertools.repeat(t_same),
        4 * n: itertools.repeat(t_same),
    })
    with pytest.raises(RuntimeError, match="physically inconsistent"):
        timing.slope_seconds(build, n, trials=3)


def test_nonfinite_chain_value_asserts(monkeypatch):
    n = 10
    clock = _FakeClock()
    monkeypatch.setattr(timing.time, "perf_counter", clock)

    def build(length):
        def run():
            clock.now += 0.01
            return float("nan")

        return run

    with pytest.raises(AssertionError, match="non-finite"):
        timing.slope_seconds(build, n, trials=2)


def test_dynamic_variant_shares_one_callable_and_cancels_fixed_cost(
    monkeypatch,
):
    """`slope_seconds_dynamic(fn, n)` drives ONE callable with the chain
    length as an argument (the one-executable protocol bench.py uses);
    same statistics: fixed dispatch cost cancels exactly."""
    clock = _FakeClock()
    monkeypatch.setattr(timing.time, "perf_counter", clock)
    calls = []

    def fn(length):
        calls.append(length)
        clock.now += FIXED + length * PER_ITER
        return 0.0

    n = 10
    t = timing.slope_seconds_dynamic(fn, n, trials=3)
    assert t == pytest.approx(PER_ITER, rel=1e-9)
    # only the two lengths ever run, through the single callable
    assert set(calls) == {n, 4 * n}


def test_dynamic_variant_rejects_impossible_pairs(monkeypatch):
    clock = _FakeClock()
    monkeypatch.setattr(timing.time, "perf_counter", clock)
    n = 10
    short_t = FIXED + n * PER_ITER
    long_t = FIXED + 4 * n * PER_ITER
    # warm-up short, warm-up long, then (short, long) pairs: first pair
    # corrupt (long returns in the short chain's time), rest honest.
    script = iter([short_t, long_t,
                   short_t, short_t,
                   short_t, long_t, short_t, long_t, short_t, long_t])

    def fn(length):
        clock.now += next(script)
        return 0.0

    t = timing.slope_seconds_dynamic(fn, n, trials=3)
    assert t == pytest.approx(PER_ITER, rel=1e-9)
