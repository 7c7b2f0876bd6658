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

    _EFFECTS = {
        "b": fx.EFFECT_DEFOCUS, "g": fx.EFFECT_DESATURATION, "h": fx.EFFECT_HAZE,
    }

    def _pipe(self, h: int, w: int) -> DepthPipeline:
        key = (h, w)
        if key not in self._pipes:
            self._pipes[key] = DepthPipeline(h, w, self.cfg)
        return self._pipes[key]

    def _prepared(self, rgb: np.ndarray, pipe: DepthPipeline):
        """Latest prepared image (device rgb + gray pyramid), cached across
        solve/render calls so repeated solve -> render loops do ZERO
        redundant gray-pyramid recompute or upload. The cache RETAINS the
        source array and matches by IDENTITY, so a recycled id() can never
        alias a different image — but identity cannot see IN-PLACE
        mutation: a caller that overwrites one buffer's pixels
        (``rgb[:] = next_frame``) must pass a fresh array per image (the
        natural result of any decode) or call ``invalidate_image_cache()``
        after mutating; otherwise solve/render serve the previous
        contents. Every facade method that takes ``rgb`` shares this
        contract (docs/API.md)."""
        cached = self._cache.get("img")
        if cached is not None and cached[0] is rgb:
            return cached[1]
        prepared = pipe.prepare_image(np.asarray(rgb, dtype=np.uint8))
        self._cache = {"img": (rgb, prepared)}
        return prepared

    def invalidate_image_cache(self) -> None:
        """Drop the prepared-image cache. Needed ONLY when the caller
        mutates an rgb buffer IN PLACE and passes the same array object
        again (the identity-keyed cache cannot detect content changes)."""
        self._cache = {}

    def solve(
        self,
        rgb: np.ndarray,
        mask: np.ndarray,
        value: np.ndarray,
        depth_state: Optional[Tuple] = None,
    ) -> np.ndarray:
        """One full solve; returns the float32 depth map. Pass the
        ``depth_state`` returned by ``solve_with_state`` to warm-start.

        NOTE on state lifetime (applies to every state-taking method here):
        the passed state's device buffers are DONATED to the compiled
        program (zero-copy in-place update); only the RETURNED state is
        valid afterwards."""
        depth, _ = self.solve_with_state(rgb, mask, value, depth_state)
        return depth

    def solve_with_state(self, rgb, mask, value, depth_state=None):
        h, w = rgb.shape[:2]
        pipe = self._pipe(h, w)
        _, gpyr = self._prepared(rgb, pipe)
        if depth_state is None:
            depth_state = pipe.initial_state()
        depth, state = pipe.solve(
            gpyr, jnp.asarray(np.asarray(mask, bool)),
            jnp.asarray(np.asarray(value, np.uint8)), depth_state,
        )
        return np.asarray(depth), state

    def render(self, rgb: np.ndarray, depth: np.ndarray, effect: str = "h") -> np.ndarray:
        """Render a depth effect: 'b' refocus, 'g' desaturation, 'h' haze.

        Reuses the prepared-image cache maintained by solve(), so a
        solve -> render loop on the same image does no per-frame
        gray-pyramid recompute or re-upload (the session path's invariant,
        now shared by the facade)."""
        h, w = rgb.shape[:2]
        pipe = self._pipe(h, w)
        eff = self._EFFECTS[effect]
        rgb_d, gpyr = self._prepared(rgb, pipe)
        out = pipe.effect(
            eff, rgb_d, gpyr[0], jnp.clip(jnp.asarray(depth, jnp.float32), 0.0, 255.0)
        )
        return np.asarray(out)

    def solve_and_render(self, rgb, mask, value, effect: str = "h",
                         depth_state: Optional[Tuple] = None):
        """Solve + effect as ONE fused program dispatch (the live loop's
        frame shape, src/main.cpp:232-295 under --live): returns
        (depth f32, art u8, depth_state). Warm-start by passing the
        returned state back in."""
        h, w = rgb.shape[:2]
        pipe = self._pipe(h, w)
        rgb_d, gpyr = self._prepared(rgb, pipe)
        if depth_state is None:
            depth_state = pipe.initial_state()
        depth, state, art = pipe.solve_and_effect(
            self._EFFECTS[effect], gpyr, rgb_d,
            jnp.asarray(np.asarray(mask, bool)),
            jnp.asarray(np.asarray(value, np.uint8)), depth_state,
        )
        return np.asarray(depth), np.asarray(art), state

    def solve_incremental(self, rgb, mask, value, depth_state, center_yx):
        """Warm windowed re-solve around a small edit centered at
        ``center_yx`` (the session's incremental live path, exposed on the
        facade): re-solves only an ``incremental_window``-sized window at
        the fine pyramid levels and injects the coarse-level delta
        (core/incremental.py). Requires a prior full solve's
        ``depth_state``; returns (depth f32, new_state)."""
        h, w = rgb.shape[:2]
        pipe = self._pipe(h, w)
        _, gpyr = self._prepared(rgb, pipe)
        depth, state = pipe.solve_incremental(
            gpyr, jnp.asarray(np.asarray(mask, bool)),
            jnp.asarray(np.asarray(value, np.uint8)), depth_state,
            jnp.asarray(np.asarray(center_yx), jnp.int32),
        )
        return np.asarray(depth), state


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
