"""A/B the resident-kernel sweep-loop unroll factor in-context.

Arms chain the L4..L2 coarse-level portion of the cascade (the piece
tools/ab_levels.py measured at 0.89 ms — latency-bound, so loop overhead is
the hypothesis) with cfg.pallas_resident_unroll in {1, 4, 8}.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_unroll.py
"""

from __future__ import annotations

import dataclasses

import numpy as np


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
    from tools.ab_levels import _cascade_partial

    h, w = 1080, 1920
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
    cfg0 = DiffusionConfig()
    gpyr = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg0))(
        rgb_to_gray(jnp.asarray(rgb))
    )
    jax.block_until_ready(gpyr)
    state0 = multigrid.initial_depth_state(h, w, cfg0)

    def arm(unroll):
        cfg = dataclasses.replace(cfg0, pallas_resident_unroll=unroll)

        def step(carry):
            state, acc = carry
            d0, state = _cascade_partial(gpyr, mask_d, value_d, state, cfg, 2)
            return state, acc + d0.sum()

        return step

    res = ab(
        {f"unroll={u}": arm(u) for u in (1, 4, 8)},
        (state0, jnp.float32(0.0)),
        K=32,
        reps=4,
    )
    for k, v in res.items():
        print(f"L4..L2 in-context, {k}: {v:.3f} ms")


if __name__ == "__main__":
    main()
