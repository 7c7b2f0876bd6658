"""Depth effects: JAX vs oracle, SAT defocus vs the naive O(k^2) oracle."""

import numpy as np
import jax.numpy as jnp

from realtimedepthdiffusion_tpu.config import DiffusionConfig
from realtimedepthdiffusion_tpu.core import effects
from realtimedepthdiffusion_tpu.oracle import numpy_ref as oracle

CFG = DiffusionConfig()


def _case(rng, h=60, w=80):
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    gray = oracle.rgb_to_gray(rgb)
    depth = (rng.random((h, w), dtype=np.float32) * 255).astype(np.float32)
    return rgb, gray, depth


def test_desaturation(rng):
    rgb, gray, depth = _case(rng)
    got = np.asarray(effects.desaturation(jnp.asarray(rgb), jnp.asarray(gray), jnp.asarray(depth)))
    want = oracle.desaturation(rgb, gray, depth)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    # near (depth 0) keeps color; far (255) is gray
    d0 = np.zeros_like(depth)
    out0 = np.asarray(effects.desaturation(jnp.asarray(rgb), jnp.asarray(gray), jnp.asarray(d0)))
    assert np.array_equal(out0, rgb)
    d255 = np.full_like(depth, 255.0)
    out255 = np.asarray(effects.desaturation(jnp.asarray(rgb), jnp.asarray(gray), jnp.asarray(d255)))
    assert np.abs(out255.astype(int) - gray[..., None].astype(int)).max() <= 1


def test_haze(rng):
    rgb, gray, depth = _case(rng)
    got = np.asarray(effects.haze(jnp.asarray(rgb), jnp.asarray(depth), CFG))
    want = oracle.haze(rgb, depth, CFG)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    # depth 0 -> t=1 -> unchanged; far -> toward airlight 255
    out0 = np.asarray(effects.haze(jnp.asarray(rgb), jnp.asarray(np.zeros_like(depth)), CFG))
    assert np.array_equal(out0, rgb)
    outfar = np.asarray(effects.haze(jnp.asarray(rgb), jnp.asarray(np.full_like(depth, 255.0)), CFG))
    assert outfar.min() >= 220  # t=exp(-2)~0.135 pulls everything near white


def test_defocus_sat_vs_naive(rng):
    rgb, gray, depth = _case(rng, 48, 64)
    want = oracle.defocus_naive(rgb, depth, CFG)
    sat = oracle.defocus(rgb, depth, CFG)
    got = np.asarray(effects.defocus(jnp.asarray(rgb), jnp.asarray(depth), CFG))
    # SAT is exact integer math; only f32-division rounding can differ: <=1
    assert np.abs(sat.astype(int) - want.astype(int)).max() <= 1
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_defocus_near_pixels_sharp(rng):
    """depth 0 -> empty window -> passthrough (count==0 branch,
    src/GPUDepthEffect.cu:62-65)."""
    rgb, gray, _ = _case(rng, 160, 208)  # k = int(0.025*diag) = 6
    depth = np.zeros((160, 208), np.float32)
    got = np.asarray(effects.defocus(jnp.asarray(rgb), jnp.asarray(depth), CFG))
    assert np.array_equal(got, rgb)
    # graded depth: far pixels differ from the source (blurred), near don't
    depth[:, 104:] = 255.0
    got2 = np.asarray(effects.defocus(jnp.asarray(rgb), jnp.asarray(depth), CFG))
    assert np.array_equal(got2[:, :100], rgb[:, :100])
    assert not np.array_equal(got2[:, 110:], rgb[:, 110:])


def test_apply_effect_dispatch(rng):
    rgb, gray, depth = _case(rng, 24, 32)
    a = jnp.asarray(rgb)
    g = jnp.asarray(gray)
    d = jnp.asarray(depth)
    assert np.array_equal(np.asarray(effects.apply_effect(effects.EFFECT_NONE, a, g, d, CFG)), rgb)
    for eff, fn in [
        (effects.EFFECT_DEFOCUS, effects.defocus(a, d, CFG)),
        (effects.EFFECT_DESATURATION, effects.desaturation(a, g, d)),
        (effects.EFFECT_HAZE, effects.haze(a, d, CFG)),
    ]:
        assert np.array_equal(
            np.asarray(effects.apply_effect(eff, a, g, d, CFG)), np.asarray(fn)
        )
