"""The depth-diffusion model facade and its preconfigured families.

A "model" binds a DiffusionConfig to the compiled pipeline and exposes the
task-level API: annotate -> solve -> render. All families share weights (the
edge-aware Laplacian derived from the image); they differ in smoother and
multigrid scheme.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import DiffusionConfig
from ..core import effects as fx
from ..pipeline import DepthPipeline


class DepthDiffusionModel:
    """Task-level facade over the compiled pipeline.

    >>> model = ChebyshevCascade()
    >>> depth = model.solve(rgb, mask, value)          # (H,W) float32
    >>> art = model.render(rgb, depth, effect="h")     # uint8 RGB
    """

    config: DiffusionConfig = DiffusionConfig()

    def __init__(self, config: Optional[DiffusionConfig] = None, **overrides):
        cfg = config if config is not None else self.config
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        self.cfg = cfg
        self._pipes = {}
        self._cache = {}

    def _pipe(self, h: int, w: int) -> DepthPipeline:
        key = (h, w)
        if key not in self._pipes:
            self._pipes[key] = DepthPipeline(h, w, self.cfg)
        return self._pipes[key]

    def solve(
        self,
        rgb: np.ndarray,
        mask: np.ndarray,
        value: np.ndarray,
        depth_state: Optional[Tuple] = None,
    ) -> np.ndarray:
        """One full solve; returns the float32 depth map. Pass the
        ``depth_state`` returned by ``solve_with_state`` to warm-start."""
        depth, _ = self.solve_with_state(rgb, mask, value, depth_state)
        return depth

    def solve_with_state(self, rgb, mask, value, depth_state=None):
        h, w = rgb.shape[:2]
        pipe = self._pipe(h, w)
        # Cache the latest prepared image; the cache RETAINS the source array
        # and matches by identity, so a recycled id() can never alias a
        # different image.
        cached = self._cache.get("img")
        if cached is not None and cached[0] is rgb:
            prepared = cached[1]
        else:
            prepared = pipe.prepare_image(np.asarray(rgb, dtype=np.uint8))
            self._cache = {"img": (rgb, prepared)}
        _, gpyr = prepared
        if depth_state is None:
            depth_state = pipe.initial_state()
        depth, state = pipe.solve(
            gpyr, jnp.asarray(np.asarray(mask, bool)),
            jnp.asarray(np.asarray(value, np.uint8)), depth_state,
        )
        return np.asarray(depth), state

    def render(self, rgb: np.ndarray, depth: np.ndarray, effect: str = "h") -> np.ndarray:
        """Render a depth effect: 'b' refocus, 'g' desaturation, 'h' haze."""
        h, w = rgb.shape[:2]
        pipe = self._pipe(h, w)
        eff = {"b": fx.EFFECT_DEFOCUS, "g": fx.EFFECT_DESATURATION, "h": fx.EFFECT_HAZE}[effect]
        rgb_d, gpyr = pipe.prepare_image(np.asarray(rgb, dtype=np.uint8))
        out = pipe.effect(
            eff, rgb_d, gpyr[0], jnp.clip(jnp.asarray(depth, jnp.float32), 0.0, 255.0)
        )
        return np.asarray(out)


class ChebyshevCascade(DepthDiffusionModel):
    """The reference algorithm: cascadic multigrid, Jacobi + Chebyshev."""

    config = DiffusionConfig(solver="jacobi_chebyshev", multigrid="cascadic")


class JacobiCascade(DepthDiffusionModel):
    """Plain Jacobi smoother (BASELINE config #1)."""

    config = DiffusionConfig(solver="jacobi", multigrid="cascadic")


class RedBlackCascade(DepthDiffusionModel):
    """Red-black Gauss-Seidel with residual early exit (BASELINE config #2)."""

    config = DiffusionConfig(solver="red_black", early_exit=True, multigrid="cascadic")


class VCycle(DepthDiffusionModel):
    """Full multigrid V-cycle (BASELINE config #4)."""

    config = DiffusionConfig(multigrid="vcycle")
