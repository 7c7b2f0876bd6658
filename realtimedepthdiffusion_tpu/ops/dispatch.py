"""Backend dispatch for the per-level solve.

Chooses the execution path for GPUMatrixFreeSolver's role (SURVEY.md C13):

- ``xla``              pure-XLA lax.fori_loop sweeps (core.solver) — runs
                       anywhere, the correctness anchor.
- ``pallas``           TPU kernels (ops.pallas_sweep): VMEM-resident for
                       levels that fit, DMA strip-blocked otherwise.
- ``pallas_interpret`` same kernels under the Pallas interpreter (CPU
                       testing of the kernel code paths).
- ``auto``             pallas on TPU-like backends, xla elsewhere.

The Pallas path implements the reference algorithm (jacobi_chebyshev) and
red-black Gauss-Seidel — each with the optional residual early exit; plain
jacobi runs on the XLA path regardless (it exists as a correctness anchor,
not a perf target) and honors early exit there.
"""

from __future__ import annotations

import jax

from ..config import DiffusionConfig
from ..core import solver as _xla_solver

_TPU_PLATFORMS = ("tpu", "axon")
VALID_BACKENDS = ("auto", "xla", "pallas", "pallas_interpret")


def _is_tpu() -> bool:
    try:
        return jax.default_backend() in _TPU_PLATFORMS
    except Exception:
        return False


def solve_level(depth, mask, gray, level, max_level, iters, cfg: DiffusionConfig):
    """Per-level solve routed to the configured backend."""
    if cfg.backend not in VALID_BACKENDS:
        raise ValueError(
            f"unknown backend {cfg.backend!r}; expected one of {VALID_BACKENDS}"
        )
    backend = cfg.backend
    _pallas_solvers = ("jacobi_chebyshev", "red_black")
    if backend == "auto":
        backend = "pallas" if (_is_tpu() and cfg.solver in _pallas_solvers) else "xla"
    if backend in ("pallas", "pallas_interpret") and cfg.solver in _pallas_solvers:
        interpret = backend == "pallas_interpret"
        if cfg.solver == "red_black":
            from .pallas_sweep import solve_level_red_black_pallas

            return solve_level_red_black_pallas(
                depth, mask, gray, level, max_level, iters, cfg, interpret=interpret
            )
        from .pallas_sweep import solve_level_pallas

        return solve_level_pallas(
            depth, mask, gray, level, max_level, iters, cfg, interpret=interpret
        )
    return _xla_solver.solve_level(depth, mask, gray, level, max_level, iters, cfg)
