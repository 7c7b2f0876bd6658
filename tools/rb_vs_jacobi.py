"""Config #2 (red-black + early exit) vs config #1 (Jacobi fixed-count)
across the 12 reference dataset pairs: per-pair chained wall-clock and the
RMSE between the two solutions (equal-quality evidence). Run ON the TPU:

    python tools/rb_vs_jacobi.py [K] [pairs...]

Emits one JSON line per pair:
  {"pair": ..., "jacobi_ms": ..., "rb_ms": ..., "rb_wins": ...,
   "jacobi_rmse": ..., "rb_rmse": ...}
(RMSEs are against an 8x-iteration converged truth, normalized to [0,1] —
the equal-or-better-quality evidence) and a summary line with the win count.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DATASET = [
    "Arara", "ArchesPark", "Dog", "Flower", "Heidelberg", "Hills",
    "Pigs", "Rock", "Straw", "StreetArt", "VintageGirl", "WomanParasol",
]


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = sys.argv[2:] or _DATASET

    from bench import _enable_compile_cache

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.core import multigrid
    from realtimedepthdiffusion_tpu.core.color import rgb_to_gray
    from realtimedepthdiffusion_tpu.io import imread_rgb, load_annotation

    cfg1 = DiffusionConfig(solver="jacobi")
    cfg2 = DiffusionConfig(solver="red_black", early_exit=True,
                           tolerance=3e-3, residual_check_every=25)

    def chained_ms(step, state0, n=3):
        def chain(k):
            return jax.jit(
                lambda s: jax.lax.fori_loop(0, k, lambda i, ss: step(ss), s)
            )

        f1, fk = chain(1), chain(K)
        jax.block_until_ready(f1(state0))
        jax.block_until_ready(fk(state0))

        def env(f):
            best = 1e9
            for _ in range(n):
                t0 = time.perf_counter()
                jax.block_until_ready(f(state0))
                best = min(best, time.perf_counter() - t0)
            return best * 1000

        return (env(fk) - env(f1)) / (K - 1)

    wins = 0
    done = 0
    for name in names:
        img = f"/root/reference/dataset/images/{name}.jpg"
        ann = f"/root/reference/dataset/annotations/{name}.png"
        if not (os.path.exists(img) and os.path.exists(ann)):
            continue
        rgb = imread_rgb(img)
        mask, value = load_annotation(ann)
        h, w = rgb.shape[:2]
        gray0 = rgb_to_gray(jnp.asarray(rgb))
        mask_d, value_d = jnp.asarray(mask), jnp.asarray(value)

        import dataclasses

        results = {}
        sols = {}
        cfg_t = dataclasses.replace(cfg1, max_iterations=8 * cfg1.max_iterations)
        gp_t = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg_t))(gray0)
        st_t = multigrid.initial_depth_state(h, w, cfg_t)
        truth, _ = jax.jit(
            lambda m, v, s: multigrid.solve_cascade(gp_t, m, v, s, cfg_t)
        )(mask_d, value_d, st_t)
        truth = np.asarray(truth)
        for tag, cfg in (("jacobi", cfg1), ("rb", cfg2)):
            gp = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg))(gray0)
            jax.block_until_ready(gp)

            def step(state):
                _, s = multigrid.solve_cascade(gp, mask_d, value_d, state, cfg)
                return s

            st0 = multigrid.initial_depth_state(h, w, cfg)
            results[tag] = chained_ms(step, st0)
            d, _ = jax.jit(
                lambda m, v, s: multigrid.solve_cascade(gp, m, v, s, cfg)
            )(mask_d, value_d, st0)
            sols[tag] = np.asarray(d)

        r2t = lambda a: float(np.sqrt(np.mean(((a - truth) / 255.0) ** 2)))
        rb_wins = (results["rb"] < results["jacobi"]) and (
            r2t(sols["rb"]) <= r2t(sols["jacobi"])
        )
        wins += bool(rb_wins)
        done += 1
        print(json.dumps({
            "pair": name, "shape": [h, w],
            "jacobi_ms": round(results["jacobi"], 3),
            "rb_ms": round(results["rb"], 3),
            "rb_wins": bool(rb_wins),
            "jacobi_rmse": round(r2t(sols["jacobi"]), 6),
            "rb_rmse": round(r2t(sols["rb"]), 6),
        }), flush=True)

    print(json.dumps({"summary": f"rb wins {wins}/{done}"}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
