"""Opt-in ON-HARDWARE test suite.

`tests/` pins the CPU backend (deterministic, TPU-independent); this
directory is the complement: bit-parity checks of the compiled Pallas
kernels against their XLA twins ON the real chip, where interpret-mode
coverage ends (Mosaic lowering, DMA/semaphore scheduling, FTZ behavior).

Run explicitly — it is not collected by `python -m pytest tests/`:

    python -m pytest tests_tpu/ -q

Everything here skips unless a TPU-like backend initializes. First run
compiles through the tunnel (minutes); bench.py's persistent compile cache
makes subsequent runs fast.
"""

import numpy as np
import pytest

import jax


def _tpu_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if not _tpu_available():
        skip = pytest.mark.skip(reason="needs a TPU backend")
        for item in items:
            item.add_marker(skip)


def pytest_configure(config):
    # Reuse bench.py's persistent compile cache (repo-local, gitignored).
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import _enable_compile_cache

    _enable_compile_cache()


@pytest.fixture(scope="session")
def case_512():
    """One moderate level: big enough for the strip kernels (the resident
    budget is exceeded), small enough to compile quickly."""
    rng = np.random.default_rng(42)
    h, w = 512, 640
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    mask = rng.random((h, w)) < 0.03
    depth = np.where(mask, rng.integers(0, 255, (h, w)), 255.0).astype(np.float32)
    return gray, mask, depth
