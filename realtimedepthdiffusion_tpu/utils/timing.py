"""Per-stage timing + structured logging (SURVEY.md §5 tracing/profiling).

The reference's only probe is one clock() pair around the solve
(src/main.cpp:29-36,234,293). Here every pipeline stage can be timed with
device synchronization, accumulated, and reported; an optional jax.profiler
trace can wrap any stage for XProf-level detail.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator

logger = logging.getLogger("rtdd")


class StageTimer:
    """Accumulating wall-clock stage timer."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            logger.debug("stage %s: %.3f ms", name, dt * 1000)

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name] * 1000
            lines.append(f"  {name}: {tot:.2f} ms total / {n} calls = {tot / n:.2f} ms")
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(out_dir: str) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace (viewable in XProf/TensorBoard)."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
