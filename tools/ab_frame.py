"""Decompose the bench.py headline frame in-context (PERF.md methodology).

Three interleaved arms, each a full carried-state chain at the bench's exact
shapes/config:
  solve        — solve_cascade only
  solve+half   — solve + the defocus half-width map (the depth->half u8 step)
  solve+defoc  — the full bench frame (solve + fused defocus effect)

Differences localize where the headline's per-frame time beyond the
microbench stage sums actually goes (the stages are measured in isolation;
this measures them inside the real frame program).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_frame.py
"""

from __future__ import annotations

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.core import multigrid
    from realtimedepthdiffusion_tpu.core.color import rgb_to_gray
    from tools.ab import ab

    h, w = 1080, 1920
    cfg = DiffusionConfig()
    rng = np.random.default_rng(0)
    try:
        from realtimedepthdiffusion_tpu.io import imread_rgb

        base = imread_rgb("/root/reference/dataset/images/Dog.jpg")
        reps = (h // base.shape[0] + 1, w // base.shape[1] + 1, 1)
        rgb = np.tile(base, reps)[:h, :w]
    except Exception:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    mask = np.zeros((h, w), bool)
    value = np.zeros((h, w), np.uint8)
    for i, d in enumerate((0, 64, 128, 192, 254)):
        y, x = 120 + 180 * i, 200 + 320 * i
        mask[y : y + 40, x : x + 60] = True
        value[y : y + 40, x : x + 60] = d

    rgb_d = jnp.asarray(rgb)
    mask_d, value_d = jnp.asarray(mask), jnp.asarray(value)
    gpyr = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg))(
        rgb_to_gray(rgb_d)
    )
    jax.block_until_ready(gpyr)
    state0 = multigrid.initial_depth_state(h, w, cfg)

    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_half_widths

    # rgb rides in the carry (returned unchanged): a closed-over device rgb
    # would be baked into the executable as a constant and its f32 cast
    # constant-folded into a lane-padded (H, W, 3->128) literal (bench.py:96).
    def solve_only(carry):
        state, rgb_c, acc = carry
        depth0, state = multigrid.solve_cascade(gpyr, mask_d, value_d, state, cfg)
        return state, rgb_c, acc + depth0.sum()

    def solve_half(carry):
        state, rgb_c, acc = carry
        depth0, state = multigrid.solve_cascade(gpyr, mask_d, value_d, state, cfg)
        half = defocus_half_widths(jnp.clip(depth0, 0.0, 255.0), h, w, cfg)
        return state, rgb_c, acc + half.astype(jnp.float32).sum()

    def solve_defocus(carry):
        state, rgb_c, acc = carry
        depth0, state = multigrid.solve_cascade(gpyr, mask_d, value_d, state, cfg)
        out = fx.apply_effect(
            fx.EFFECT_DEFOCUS, rgb_c, gpyr[0], jnp.clip(depth0, 0.0, 255.0), cfg
        )
        return state, rgb_c, acc + out.astype(jnp.float32).sum()

    x0 = (state0, rgb_d, jnp.float32(0.0))
    res = ab(
        {
            "solve": solve_only,
            "solve+half": solve_half,
            "solve+defocus": solve_defocus,
        },
        x0,
        K=32,
        reps=4,
    )
    solve = res["solve"]
    print(f"solve cascade in-context: {solve:.3f} ms")
    print(f"half-width map:           {res['solve+half'] - solve:+.3f} ms")
    print(f"defocus total:            {res['solve+defocus'] - solve:+.3f} ms")


if __name__ == "__main__":
    main()
