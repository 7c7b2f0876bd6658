"""End-to-end compiled pipeline with per-shape program caching.

One ``DepthPipeline`` per (image size, config) compiles:
- ``solve``:   annotation pyramids -> seeding -> cascadic (or V-cycle)
               multigrid solve -> new depth-state pyramid   (ONE XLA program)
- ``effect_*``: the three depth effects, each fused with the uint8 readout
- ``solve_and_effect``: solve + effect in a single program (the
  BASELINE.json north-star fusion)

The reference re-uploads host state and re-launches ~2000 kernels per solve
(SURVEY.md §3.2-3.3); here device arrays are the source of truth and a solve
is exactly one dispatch.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DiffusionConfig
from .core import effects as fx
from .core.color import rgb_to_gray
from .core.multigrid import (
    build_gray_pyramid,
    initial_depth_state,
    solve_cascade,
    solve_vcycle,
)


class DepthPipeline:
    """Compiled solve/effect programs for one image size + config.

    Stateless w.r.t. the image: callers pass (and carry) the depth-state
    pyramid, which warm-starts subsequent solves exactly like the
    reference's persistent deviceDepthImage pyramid (src/main.cpp:135-136).
    """

    def __init__(self, rows: int, cols: int, cfg: DiffusionConfig = DiffusionConfig()):
        self.rows, self.cols, self.cfg = rows, cols, cfg
        self.levels = cfg.num_levels(rows, cols)
        driver = solve_vcycle if cfg.multigrid == "vcycle" else solve_cascade

        def _solve(gray_pyr, mask0, value0, depth_state):
            return driver(gray_pyr, mask0, value0, depth_state, cfg)

        # donate depth_state: the solver consumes and replaces it in place.
        self._solve = jax.jit(_solve, donate_argnums=(3,))

        def _solve_and_effect(effect, gray_pyr, rgb, mask0, value0, depth_state):
            depth0, state = driver(gray_pyr, mask0, value0, depth_state, cfg)
            # Effects consume display-range depth (the unclamped Chebyshev
            # extrapolation can overshoot [0,255] slightly) — same clip as
            # every unfused call site.
            out = fx.apply_effect(
                effect, rgb, gray_pyr[0], jnp.clip(depth0, 0.0, 255.0), cfg
            )
            return depth0, state, out

        self._solve_and_effect = jax.jit(
            _solve_and_effect, static_argnums=(0,), donate_argnums=(5,)
        )

        def _solve_incremental(gray_pyr, mask0, value0, depth_state, center):
            from .core.incremental import solve_incremental

            return solve_incremental(gray_pyr, mask0, value0, depth_state, center, cfg)

        self._solve_incremental = jax.jit(_solve_incremental, donate_argnums=(3,))

        def _solve_incremental_and_effect(effect, gray_pyr, rgb, mask0, value0,
                                          depth_state, center):
            from .core.incremental import solve_incremental

            depth0, state = solve_incremental(
                gray_pyr, mask0, value0, depth_state, center, cfg
            )
            out = fx.apply_effect(
                effect, rgb, gray_pyr[0], jnp.clip(depth0, 0.0, 255.0), cfg
            )
            return depth0, state, out

        self._solve_incremental_and_effect = jax.jit(
            _solve_incremental_and_effect, static_argnums=(0,), donate_argnums=(5,)
        )

        def _update_annotation_window(mask_d, value_d, mask_win, value_win, origin):
            # Device-side dirty-window annotation update: the host uploads
            # only the window bytes instead of two full planes.
            return (
                jax.lax.dynamic_update_slice(mask_d, mask_win, origin),
                jax.lax.dynamic_update_slice(value_d, value_win, origin),
            )

        self._update_annotation_window = jax.jit(_update_annotation_window)
        self._effect = jax.jit(
            lambda effect, rgb, gray, depth: fx.apply_effect(effect, rgb, gray, depth, cfg),
            static_argnums=(0,),
        )
        self._gray_pyramid = jax.jit(lambda g: build_gray_pyramid(g, cfg))
        self._to_u8 = jax.jit(
            lambda d: jnp.clip(jnp.rint(d), 0, 255).astype(jnp.uint8)
        )
        # Same float32 multiply as io.depth_to_u16's host form, so device
        # and host conversions agree bit-for-bit.
        self._to_u16 = jax.jit(
            lambda d: jnp.clip(jnp.rint(d * jnp.float32(257.0)), 0, 65535).astype(
                jnp.uint16
            )
        )

        def _residuals(gray_pyr, mask0, value0, depth_state):
            # Per-level residuals of the current depth state, both norms
            # (max row 0, rms row 1) — the convergence observability the
            # reference lacks (its deviceError buffer is dead, SURVEY.md
            # quirk #2). Showing both explains early-exit behavior: the
            # rms is what cfg.residual_metric='rms' gates on.
            from .core.multigrid import build_annotation_pyramids
            from .core.solver import residual_norm, residual_rms
            from .core.weights import edge_weights

            masks, _ = build_annotation_pyramids(mask0, value0, cfg)
            L = len(gray_pyr) - 1
            res = []
            for l in range(len(gray_pyr)):
                wts = edge_weights(gray_pyr[l], depth_state[l], l, L, cfg)
                res.append(jnp.stack([
                    residual_norm(depth_state[l], masks[l], wts),
                    residual_rms(depth_state[l], masks[l], wts),
                ]))
            return jnp.stack(res, axis=1)

        self._residuals = jax.jit(_residuals)

    # -- setup -----------------------------------------------------------
    def prepare_image(self, rgb_u8: np.ndarray):
        """Upload the image once; returns (rgb_dev, gray_pyramid)."""
        rgb = jnp.asarray(rgb_u8, dtype=jnp.uint8)
        gray0 = rgb_to_gray(rgb)
        return rgb, self._gray_pyramid(gray0)

    def initial_state(self) -> Tuple[jnp.ndarray, ...]:
        return initial_depth_state(self.rows, self.cols, self.cfg)

    # -- the critical path -------------------------------------------------
    def solve(self, gray_pyr, mask0, value0, depth_state):
        """Full multigrid solve; returns (depth0_f32, new_depth_state)."""
        return self._solve(gray_pyr, mask0, value0, depth_state)

    def solve_and_effect(self, effect: int, gray_pyr, rgb, mask0, value0, depth_state):
        """Fused solve + effect; returns (depth0, new_state, effect_rgb_u8)."""
        return self._solve_and_effect(effect, gray_pyr, rgb, mask0, value0, depth_state)

    def solve_incremental(self, gray_pyr, mask0, value0, depth_state, center_yx):
        """Localized warm re-solve around an edit (core/incremental.py);
        returns (depth0, new_state). ``center_yx``: (2,) int32, L0 coords."""
        return self._solve_incremental(gray_pyr, mask0, value0, depth_state, center_yx)

    def solve_incremental_and_effect(self, effect: int, gray_pyr, rgb, mask0,
                                     value0, depth_state, center_yx):
        return self._solve_incremental_and_effect(
            effect, gray_pyr, rgb, mask0, value0, depth_state, center_yx
        )

    def update_annotation_window(self, mask_d, value_d, mask_win, value_win, origin):
        """Upload only a dirty window into the device annotation planes."""
        return self._update_annotation_window(
            mask_d, value_d, mask_win, value_win, origin
        )

    def effect(self, effect: int, rgb, gray0, depth0):
        return self._effect(effect, rgb, gray0, depth0)

    def depth_u8(self, depth0) -> jnp.ndarray:
        """float32 depth -> uint8 display/export (convertTo(CV_8UC1),
        src/main.cpp:290)."""
        return self._to_u8(depth0)

    def depth_u16(self, depth0) -> jnp.ndarray:
        """float32 depth -> uint16 full-precision export (io.depth_to_u16
        semantics), converted ON DEVICE so the 16-bit serving readback stays
        2 bytes/px instead of fetching f32."""
        return self._to_u16(depth0)

    def residuals(self, gray_pyr, mask0, value0, depth_state) -> jnp.ndarray:
        """Per-level residuals of a depth state, shape (2, levels): row 0
        max-norm, row 1 rms (coarse last)."""
        return self._residuals(gray_pyr, mask0, value0, depth_state)


@functools.lru_cache(maxsize=8)
def get_pipeline(rows: int, cols: int, cfg: DiffusionConfig = DiffusionConfig()) -> DepthPipeline:
    """Shape-keyed pipeline cache (cfg is hashable: frozen dataclass)."""
    return DepthPipeline(rows, cols, cfg)
