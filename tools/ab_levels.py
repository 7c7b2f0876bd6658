"""Per-level IN-CONTEXT decomposition of the solve cascade (round 3).

tools/ab_frame.py showed the full solve cascade costs 3.02 ms inside the real
frame program while the isolated quiet-window stage rows sum to ~1.7. This
tool localizes the difference: interleaved K-chained arms run the cascade
with the solve dispatch enabled only for levels >= a cutoff (annotation
pyramids, seeds, weight builds and pyrUps always run — they are the glue the
cascade pays regardless), so successive differences give each level's
in-context cost including its weight-plane build.

Arms (5-level 1080p pyramid, L=4 coarsest):
  glue     — no solves at all (annotation pyrs + seeds + pyrUps only)
  +L4..L2  — solves at the three VMEM-resident coarse levels
  +L1      — plus the 540x960 strip megakernel level
  +L0      — the full cascade (= the bench frame's solve)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_levels.py
"""

from __future__ import annotations

import numpy as np


def _cascade_partial(gray_pyr, mask0, value0, depth_state, cfg, min_level):
    """solve_cascade (core/multigrid.py) with solves only at
    level >= min_level; glue always runs. Kept in lockstep with the real
    function so the arms measure the shipped program's pieces."""
    import jax.numpy as jnp

    from realtimedepthdiffusion_tpu.core.annotation import (
        annotation_pyr_down,
        seed_depth,
    )
    from realtimedepthdiffusion_tpu.core.pyramid import pyr_up
    from realtimedepthdiffusion_tpu.ops import dispatch as _dispatch

    levels = len(gray_pyr)
    L = levels - 1
    sizes = [g.shape for g in gray_pyr]
    masks = [mask0]
    values = [value0]
    for l in range(1, levels):
        m, v = annotation_pyr_down(masks[-1], values[-1], sizes[l])
        masks.append(m)
        values.append(v)
    state = list(depth_state)
    state[L] = seed_depth(state[L], masks[L], values[L])
    for level in range(L, -1, -1):
        if level >= min_level:
            iters = cfg.level_iterations(levels, level)
            state[level] = _dispatch.solve_level(
                state[level], masks[level], gray_pyr[level], level, L, iters, cfg
            )
        if level > 0:
            up = pyr_up(state[level], sizes[level - 1])
            state[level - 1] = seed_depth(up, masks[level - 1], values[level - 1])
    return state[0], tuple(state)


def main():
    import os

    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
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
    mask_d, value_d = jnp.asarray(mask), jnp.asarray(value)
    gpyr = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg))(
        rgb_to_gray(jnp.asarray(rgb))
    )
    jax.block_until_ready(gpyr)
    state0 = multigrid.initial_depth_state(h, w, cfg)

    def arm(min_level):
        def step(carry):
            state, acc = carry
            d0, state = _cascade_partial(gpyr, mask_d, value_d, state, cfg, min_level)
            return state, acc + d0.sum()

        return step

    res = ab(
        {
            "glue": arm(5),
            "+L4..L2": arm(2),
            "+L1": arm(1),
            "+L0 (full)": arm(0),
        },
        (state0, jnp.float32(0.0)),
        K=32,
        reps=4,
    )
    print(f"glue (ann pyrs+seeds+pyrUps): {res['glue']:.3f} ms")
    print(f"L4..L2 solves (1750 sweeps + weights): {res['+L4..L2'] - res['glue']:+.3f} ms")
    print(f"L1 solve (125 sweeps + weights):       {res['+L1'] - res['+L4..L2']:+.3f} ms")
    print(f"L0 solve (62 sweeps + weights):        {res['+L0 (full)'] - res['+L1']:+.3f} ms")
    print(f"full cascade in-context:               {res['+L0 (full)']:.3f} ms")


if __name__ == "__main__":
    main()
