"""Depth-based artistic effects (JAX).

TPU-native rebuild of GPUDepthEffect.cu:
- desaturation (src/GPUDepthEffect.cu:8-27): pointwise lerp toward gray
- haze (src/GPUDepthEffect.cu:74-93): dark-channel transmission model
- defocus/refocus (src/GPUDepthEffect.cu:29-72): depth-proportional box blur.
  The reference's kernel is a naive O(W*H*k^2) gather (its slowest kernel,
  SURVEY.md §3.4); here it is O(W*H) via an exact integer summed-area table
  (two cumsums + four gathers), identical output up to f32 division rounding.

All three share one fused entry point (``apply_effect``) so solve+effect can
compile into a single program (the BASELINE.json north-star fusion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DiffusionConfig

EFFECT_NONE = 0
EFFECT_DEFOCUS = 1  # key 'b' (refocus/blur), src/main.cpp:190-202
EFFECT_DESATURATION = 2  # key 'g', src/main.cpp:204-216
EFFECT_HAZE = 3  # key 'h', src/main.cpp:218-230


def desaturation(rgb: jnp.ndarray, gray: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """f = depth/255; out = f*gray + (1-f)*color (far pixels fade to gray)."""
    f = (depth.astype(jnp.float32) / 255.0)[..., None]
    out = f * gray.astype(jnp.float32)[..., None] + (1.0 - f) * rgb.astype(jnp.float32)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def haze(
    rgb: jnp.ndarray, depth: jnp.ndarray, cfg: DiffusionConfig = DiffusionConfig()
) -> jnp.ndarray:
    """t = exp(-haze_beta * depth/255); out = t*color + (1-t)*airlight
    (He et al. 2009 Eq. 1-2 with airlight 255)."""
    t = jnp.exp(-jnp.float32(cfg.haze_beta) * depth.astype(jnp.float32) / 255.0)[..., None]
    out = t * rgb.astype(jnp.float32) + (1.0 - t) * jnp.float32(cfg.haze_airlight)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def defocus(
    rgb: jnp.ndarray, depth: jnp.ndarray, cfg: DiffusionConfig = DiffusionConfig()
) -> jnp.ndarray:
    """Depth-proportional box blur via exact int32 summed-area table.

    Per-pixel window half-width = int(k * depth/255) // 2 with
    k = 0.025 * diagonal (src/GPUDepthEffect.cu:42-43); window
    [c-h, c+h-1] per axis clipped to the image; empty window passes the
    source pixel through (the count == 0 branch).
    """
    h, w = depth.shape
    k = cfg.defocus_kernel_size(h, w)
    ka = (jnp.float32(k) * jnp.maximum(depth.astype(jnp.float32), 0.0) / 255.0).astype(
        jnp.int32
    )
    half = ka // 2

    sat = jnp.cumsum(jnp.cumsum(rgb.astype(jnp.int32), axis=0), axis=1)
    sat = jnp.pad(sat, ((1, 0), (1, 0), (0, 0)))  # (h+1, w+1, 3), sat[0,*]=0

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    y0 = jnp.maximum(yy - half, 0)
    y1 = jnp.minimum(yy + half - 1, h - 1)
    x0 = jnp.maximum(xx - half, 0)
    x1 = jnp.minimum(xx + half - 1, w - 1)
    cnt = ((y1 - y0 + 1) * (x1 - x0 + 1)).astype(jnp.float32)

    box = (
        sat[y1 + 1, x1 + 1]
        - sat[y0, x1 + 1]
        - sat[y1 + 1, x0]
        + sat[y0, x0]
    ).astype(jnp.float32)
    empty = (half == 0) | (y0 > y1) | (x0 > x1)
    mean = (box / jnp.maximum(cnt, 1.0)[..., None]).astype(jnp.uint8)
    return jnp.where(empty[..., None], rgb, mean)


def apply_effect(
    effect: int,
    rgb: jnp.ndarray,
    gray: jnp.ndarray,
    depth: jnp.ndarray,
    cfg: DiffusionConfig = DiffusionConfig(),
) -> jnp.ndarray:
    """Static dispatch over the sticky effect modes (src/main.cpp:190-230).

    ``effect`` is a Python int (modes are session state, not data), so each
    mode compiles to its own minimal program.
    """
    if effect == EFFECT_DEFOCUS:
        return defocus(rgb, depth, cfg)
    if effect == EFFECT_DESATURATION:
        return desaturation(rgb, gray, depth)
    if effect == EFFECT_HAZE:
        return haze(rgb, depth, cfg)
    return rgb
