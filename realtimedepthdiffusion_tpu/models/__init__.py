"""Model families: preconfigured solver/multigrid variants of the depth
diffusion pipeline.

The framework's "models" are PDE-solver configurations (the reference ships
exactly one, hard-coded: cascadic Jacobi+Chebyshev, src/GPUSolver.cu:274-316).

- ``ChebyshevCascade``   the reference algorithm (default)
- ``JacobiCascade``      plain Jacobi smoother (BASELINE config #1)
- ``RedBlackCascade``    red-black Gauss-Seidel + residual early exit (#2)
- ``VCycle``             full multigrid V-cycle (#4)
"""

from .depth_diffusion import (
    ChebyshevCascade,
    DepthDiffusionModel,
    JacobiCascade,
    RedBlackCascade,
    VCycle,
)

__all__ = [
    "DepthDiffusionModel",
    "ChebyshevCascade",
    "JacobiCascade",
    "RedBlackCascade",
    "VCycle",
]
