"""The chained-slope timing protocol — ONE definition for every benchmark.

This environment's TPU relay (a) acks `block_until_ready` before true device
completion and (b) adds a ~25 ms FIXED round trip per dispatch, so the only
trustworthy timing is: N executions CHAINED inside one jitted program via a
real data dependency, completion forced by a host readback of one scalar,
and the per-iteration time taken as the SLOPE between two chain lengths —
(T(4n) - T(n)) / 3n — which cancels the fixed dispatch cost exactly.  See
BENCHMARK.md "measurement integrity" for the measurements behind this.

Two caveats the helpers below encode:
  * XLA HOISTS loop-invariant work out of a timing scan — every input the
    body consumes must be perturbed by the running accumulator (a literal
    `* 0` factor does not count: it can be algebraically folded);
  * chips from the relay pool vary in load — only compare numbers measured
    interleaved within one process (run a matmul canary alongside).

Used by `bench.py` (driver-scored) and every `scripts/profile_*.py`.
"""

from __future__ import annotations

import time

import numpy as np


def slope_seconds(build_chained, n: int, trials: int = 3) -> float:
    """Per-iteration seconds as the slope between chains of n and 4n.

    `build_chained(length)` must return a ZERO-ARG callable executing
    `length` chained iterations and returning a host-readable scalar
    (its `float()` is the completion barrier).  Each chain is compiled +
    warmed once, then the two chains are timed in INTERLEAVED PAIRS and the
    reported slope is the MEDIAN over physically-consistent pairs.

    Why not best-of-min: host stalls only ever ADD time, but this relay has
    also produced rare too-FAST samples (a long chain returning in roughly
    the short chain's time — observed once in ~10 canary runs; a min() then
    selects exactly the corrupted sample and the slope collapses to ~0,
    reporting absurd throughput).  A pair whose long-chain time is not
    strictly greater than its short-chain time is physically impossible
    (4x the chained work, same fixed dispatch cost) and is rejected;
    the median over the surviving pairs absorbs one-sided stall noise.
    """
    return _paired_slope(build_chained(n), build_chained(4 * n), n, trials)


def _paired_slope(short, long, n: int, trials: int) -> float:
    def timed(f):
        t0 = time.perf_counter()
        val = float(f())
        dt = time.perf_counter() - t0
        assert np.isfinite(val), f"non-finite chained value {val}"
        return dt

    timed(short)  # compile + warm
    timed(long)
    slopes = []
    for _ in range(3 * trials):
        t_s = timed(short)
        t_l = timed(long)
        if t_l > t_s:
            slopes.append((t_l - t_s) / (3 * n))
            if len(slopes) >= trials:
                break
    if not slopes:
        raise RuntimeError(
            "slope_seconds: every sample pair was physically inconsistent "
            "(long chain never slower than short chain) — relay too noisy"
        )
    return float(np.median(slopes))


def slope_seconds_dynamic(fn, n: int, trials: int = 3) -> float:
    """`slope_seconds` with ONE compiled executable instead of two.

    `fn(length)` must run `length` chained iterations where `length` is a
    DYNAMIC value (a `lax.fori_loop` trip count passed in as a device
    scalar), so the n and 4n chains share a single compilation — halving
    per-row compile cost vs `slope_seconds`.  Sampling is identical
    (interleaved pairs, physically-impossible pairs rejected, median).
    A static-trip-count scan and a dynamic fori_loop both lower to an XLA
    While with the same body schedule, so the measured slope is
    equivalent — verified on-chip (BENCHMARK.md round 4).
    """
    return _paired_slope(lambda: fn(n), lambda: fn(4 * n), n, trials)


def chained_seconds(step_fn, carry, n: int, trials: int = 3) -> float:
    """`slope_seconds` convenience for a `step_fn(carry) -> carry` body.

    The carry must thread a REAL data dependency through every iteration
    (perturb each input by the accumulator); it reduces to one scalar for
    the host readback.
    """
    import jax
    import jax.numpy as jnp

    def build(length):
        @jax.jit
        def chained(c):
            def body(c, _):
                return step_fn(c), None

            out, _ = jax.lax.scan(body, c, None, length=length)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

        return lambda: chained(carry)

    return slope_seconds(build, n, trials=trials)
