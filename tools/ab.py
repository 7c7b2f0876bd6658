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
...) so slow drift hits all arms equally; the min over reps is reported.
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

    best = {name: float("inf") for name in fns}
    for _ in range(reps):
        for name, (f1, fK) in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fK(x0))
            tk = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(f1(x0))
            t1 = time.perf_counter() - t0
            best[name] = min(best[name], (tk - t1) / (K - 1) * 1000.0)
    if verbose:
        for name, ms in best.items():
            print(f"{name}: {ms:.3f} ms")
    return best
