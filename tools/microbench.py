"""Per-stage device-time microbenchmarks (feeds the PERF.md breakdown).

Usage: python tools/microbench.py [stage ...]
Stages: levels, effects, glue, rb, all (default).

Same K-chained methodology as bench.py: each stage runs K times inside one
compiled program with carried state; per-iteration time = (t(K)-t(1))/(K-1),
so the tunnel RTT cancels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _enable_compile_cache  # noqa: E402


def main(which):
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.core import multigrid
    from realtimedepthdiffusion_tpu.core.color import rgb_to_gray
    from realtimedepthdiffusion_tpu.ops.dispatch import solve_level

    h, w = 1080, 1920
    cfg = DiffusionConfig()
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    mask = np.zeros((h, w), bool)
    value = np.zeros((h, w), np.uint8)
    for i, d in enumerate((0, 64, 128, 192, 254)):
        y, x = 120 + 180 * i, 200 + 320 * i
        mask[y : y + 40, x : x + 60] = True
        value[y : y + 40, x : x + 60] = d
    mask_d, value_d = jnp.asarray(mask), jnp.asarray(value)
    gray0 = rgb_to_gray(rgb)
    gpyr = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg))(gray0)
    jax.block_until_ready(gpyr)
    levels = cfg.num_levels(h, w)
    L = levels - 1

    def emit(name, ms):
        print(json.dumps({"stage": name, "ms": round(float(ms), 4)}), flush=True)

    def chained_ms(step, state0, K=8, n=3):
        fns = [
            jax.jit(lambda s, k=k: jax.lax.fori_loop(0, k, lambda i, ss: step(ss), s))
            for k in (1, K)
        ]
        for f in fns:
            jax.block_until_ready(f(state0))

        def env(f):
            best = 1e9
            for _ in range(n):
                t0 = time.perf_counter()
                jax.block_until_ready(f(state0))
                best = min(best, time.perf_counter() - t0)
            return best * 1000

        return (env(fns[1]) - env(fns[0])) / (K - 1)

    masks, values = multigrid.build_annotation_pyramids(mask_d, value_d, cfg)
    state = multigrid.initial_depth_state(h, w, cfg)

    if "levels" in which:
        for lvl in range(levels):
            iters = cfg.level_iterations(levels, lvl)
            g, m, v = gpyr[lvl], masks[lvl], values[lvl]
            d0 = jnp.where(m, v.astype(jnp.float32), jnp.float32(cfg.depth_init))

            def step(u, g=g, m=m, lvl=lvl, iters=iters):
                out = solve_level(u, m, g, lvl, L, iters, cfg)
                return out + jnp.float32(1e-30)  # carry dependency

            ms = chained_ms(step, d0, K=4 if lvl <= 1 else 8)
            emit(f"L{lvl} solve ({g.shape[0]}x{g.shape[1]}, {iters} sweeps)", ms)

    if "effects" in which:
        d0 = jnp.asarray(
            rng.random((h, w), dtype=np.float32) * 255
        )
        for name, eff in (("defocus", fx.EFFECT_DEFOCUS),
                          ("desaturation", fx.EFFECT_DESATURATION),
                          ("haze", fx.EFFECT_HAZE)):
            def step(d, eff=eff):
                out = fx.apply_effect(eff, rgb, gpyr[0], d, cfg)
                # consume the WHOLE output: a single-pixel tap lets XLA
                # dead-code-eliminate most of the effect
                return d + out.astype(jnp.float32).mean() * jnp.float32(1e-30)

            emit(name, chained_ms(step, d0, K=8))

    if "glue" in which:
        def step_glue(d):
            ms_, vs_ = multigrid.build_annotation_pyramids(mask_d, value_d, cfg)
            acc = d
            for lvl in range(1, levels):
                from realtimedepthdiffusion_tpu.core.pyramid import pyr_up
                from realtimedepthdiffusion_tpu.core.annotation import seed_depth

                up = pyr_up(jnp.zeros(gpyr[lvl].shape, jnp.float32) + d[0, 0],
                            gpyr[lvl - 1].shape)
                acc = acc + seed_depth(up, ms_[lvl - 1], vs_[lvl - 1])[0, 0]
            return acc

        emit("glue (annotation pyrs + seeds + pyrUps)",
             chained_ms(step_glue, jnp.zeros((8, 128), jnp.float32), K=8))

        from realtimedepthdiffusion_tpu.core.weights import edge_weights

        def step_w(d):
            wts = edge_weights(gray0, d, 0, L, cfg)
            return d + wts.inv_count * jnp.float32(1e-9)

        emit("L0 weight planes", chained_ms(step_w, state[0], K=8))

    if "rb" in which:
        import dataclasses

        cfg2 = dataclasses.replace(cfg, solver="red_black", early_exit=False)
        for lvl in (0, 1):
            iters = cfg.level_iterations(levels, lvl)
            g, m, v = gpyr[lvl], masks[lvl], values[lvl]
            d0 = jnp.where(m, v.astype(jnp.float32), jnp.float32(cfg.depth_init))

            def step(u, g=g, m=m, lvl=lvl, iters=iters):
                return solve_level(u, m, g, lvl, L, iters, cfg2) + jnp.float32(1e-30)

            emit(f"L{lvl} red-black ({iters} iters, fixed)", chained_ms(step, d0, K=4))


if __name__ == "__main__":
    args = sys.argv[1:] or ["all"]
    which = {"levels", "effects", "glue", "rb"} if "all" in args else set(args)
    main(which)
