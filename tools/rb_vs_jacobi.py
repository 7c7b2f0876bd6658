"""Config #2 (red-black + early exit) vs config #1 (Jacobi fixed-count)
across the 12 reference dataset pairs: per-pair chained wall-clock and the
RMSE of each solution against an 8x-iteration jacobi_chebyshev truth
(equal-quality evidence). Run ON the TPU:

    python tools/rb_vs_jacobi.py [K] [--tols 3e-3,1e-2] [pairs...]

Arms: "jacobi" (plain fixed-count — BASELINE config #1 as benched),
"jch" (jacobi_chebyshev — the reference's actual 1937-sweep schedule, the
stronger baseline), and one "rb@tol" per requested tolerance (red-black
SOR + residual early exit — config #2). Emits one JSON line per pair:
  {"pair": ..., "shape": ..., "ms": {arm: ...}, "rmse": {arm: ...},
   "rb_wins_vs_jacobi": ..., "rb_wins_vs_jch": ...}
(win = first rb arm no slower AND no worse RMSE than that baseline) and a
summary line with both win counts.
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
    argv = list(sys.argv[1:])
    tols = [3e-3]
    if "--tols" in argv:
        i = argv.index("--tols")
        tols = [float(t) for t in argv[i + 1].split(",")]
        del argv[i : i + 2]
    K = int(argv.pop(0)) if argv and argv[0].isdigit() else 8
    names = argv or _DATASET

    from bench import _enable_compile_cache

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.core import multigrid
    from realtimedepthdiffusion_tpu.core.color import rgb_to_gray
    from realtimedepthdiffusion_tpu.io import imread_rgb, load_annotation

    cfgs = {"jacobi": DiffusionConfig(solver="jacobi"),
            "jch": DiffusionConfig(solver="jacobi_chebyshev")}
    for tol in tols:
        cfgs[f"rb@{tol:g}"] = DiffusionConfig(
            solver="red_black", early_exit=True, tolerance=tol,
            residual_check_every=25,
        )
    rb0 = f"rb@{tols[0]:g}"

    def chained_fns(step, state0):
        def chain(k):
            return jax.jit(
                lambda s: jax.lax.fori_loop(0, k, lambda i, ss: step(ss), s)
            )

        f1, fk = chain(1), chain(K)
        jax.block_until_ready(f1(state0))
        jax.block_until_ready(fk(state0))
        return f1, fk, state0

    def interleaved_ms(arms, n=4):
        """Per-frame ms for each arm, measured in interleaved rounds (the
        tools/ab.py methodology: sequential arms read tunnel weather, not
        engineering — round-3's first harness run attributed a 3.4x noise
        spike to config #1 this way). Median over reps per envelope."""
        import statistics

        envs = {tag: {"f1": [], "fk": []} for tag in arms}
        for _ in range(n):
            for tag, (f1, fk, s0) in arms.items():
                t0 = time.perf_counter()
                jax.block_until_ready(f1(s0))
                envs[tag]["f1"].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                jax.block_until_ready(fk(s0))
                envs[tag]["fk"].append(time.perf_counter() - t0)
        return {
            tag: 1000.0
            * (statistics.median(e["fk"]) - statistics.median(e["f1"]))
            / (K - 1)
            for tag, e in envs.items()
        }

    wins = 0
    wins_jch = 0
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

        sols = {}
        arms = {}
        cfg_t = dataclasses.replace(
            cfgs["jch"], max_iterations=8 * cfgs["jch"].max_iterations
        )
        gp_t = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg_t))(gray0)
        st_t = multigrid.initial_depth_state(h, w, cfg_t)
        truth, _ = jax.jit(
            lambda m, v, s: multigrid.solve_cascade(gp_t, m, v, s, cfg_t)
        )(mask_d, value_d, st_t)
        truth = np.asarray(truth)
        for tag, cfg in cfgs.items():
            gp = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg))(gray0)
            jax.block_until_ready(gp)

            def step(state, gp=gp, cfg=cfg):
                _, s = multigrid.solve_cascade(gp, mask_d, value_d, state, cfg)
                return s

            st0 = multigrid.initial_depth_state(h, w, cfg)
            arms[tag] = chained_fns(step, st0)
            d, _ = jax.jit(
                lambda m, v, s: multigrid.solve_cascade(gp, m, v, s, cfg)
            )(mask_d, value_d, st0)
            sols[tag] = np.asarray(d)
        results = interleaved_ms(arms)

        r2t = lambda a: float(np.sqrt(np.mean(((a - truth) / 255.0) ** 2)))
        rmse = {tag: round(r2t(s), 6) for tag, s in sols.items()}

        def beats(base):
            return (results[rb0] <= results[base]) and (rmse[rb0] <= rmse[base])

        w1, w2 = beats("jacobi"), beats("jch")
        wins += bool(w1)
        wins_jch += bool(w2)
        done += 1
        print(json.dumps({
            "pair": name, "shape": [h, w],
            "ms": {t: round(v, 3) for t, v in results.items()},
            "rmse": rmse,
            "rb_wins_vs_jacobi": bool(w1),
            "rb_wins_vs_jch": bool(w2),
        }), flush=True)

    print(json.dumps({
        "summary": f"rb wins {wins}/{done} vs jacobi, {wins_jch}/{done} vs jch"
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
