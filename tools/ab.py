"""Same-process interleaved A/B timing harness (the PERF.md methodology).

The TPU tunnel's noise floor moves ~2x between sessions, so cross-session
deltas are weather; only same-process, interleaved, K-chained comparisons
produce decisions that replicate. This module packages that pattern:

    from tools.ab import ab
    ab({
        "arena":    lambda d: solve(d, arena=True),
        "no-arena": lambda d: solve(d, arena=False),
    }, depth0, K=32, reps=4)

Each variant is compiled as chain(1) and chain(K) (a lax.fori_loop carrying
the state so nothing hoists); per-iteration time is (t(K)-t(1))/(K-1), which
cancels the relay RTT. Variants are timed in interleaved rounds (A B C A B C
...) so slow drift hits all arms equally; the MEDIAN over reps is reported
(the min is hypersensitive to one lucky quiet window producing a negative
delta that doesn't replicate).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Mapping


def _chain(fn: Callable, k: int):
    import jax

    return jax.jit(lambda x: jax.lax.fori_loop(0, k, lambda i, xx: fn(xx), x))


def ab(
    variants: Mapping[str, Callable],
    x0,
    K: int = 32,
    reps: int = 4,
    verbose: bool = True,
) -> Dict[str, float]:
    """Time each variant (a unary device function state->state) and return
    {name: best_ms_per_iteration}. Compiles everything first, then times in
    interleaved rounds."""
    import jax

    if K < 2:
        raise ValueError("K must be >= 2: per-iteration time is (t(K)-t(1))/(K-1)")
    fns = {}
    for name, fn in variants.items():
        f1, fK = _chain(fn, 1), _chain(fn, K)
        jax.block_until_ready(f1(x0))
        jax.block_until_ready(fK(x0))
        fns[name] = (f1, fK)

    samples = {name: [] for name in fns}
    for _ in range(reps):
        for name, (f1, fK) in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fK(x0))
            tk = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(f1(x0))
            t1 = time.perf_counter() - t0
            samples[name].append((tk - t1) / (K - 1) * 1000.0)
    # Median, not min: envelope outliers reach +-several ms in this
    # environment, so (tk - t1) differences can go NEGATIVE and a min over
    # reps latches onto a single lucky pairing (observed: two min-based
    # A/Bs of the same pair flipping 11% each way while medians agreed).
    med = {}
    for name, v in samples.items():
        v = sorted(v)
        med[name] = v[len(v) // 2]
        if verbose:
            print(f"{name}: median {med[name]:.3f} ms  (min {v[0]:.3f}, "
                  f"max {v[-1]:.3f}, n={len(v)})")
    return med
