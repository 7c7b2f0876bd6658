"""Extended benchmarks: the five BASELINE.json configs, one JSON line each.

(The driver contract file is bench.py — ONE line, headline metric. This
suite exists for completeness/reporting; see PERF.md.)

1. Jacobi scribble-diffusion, fixed iterations, dataset pair
2. Red-black Gauss-Seidel with residual-tolerance early exit
3. Edge-aware anisotropic Laplacian weights from image gradients
4. Full multigrid V-cycle at 1080p
5. Live loop: incremental scribble update + fused effect

All numbers are per-frame device times via the K-chained methodology
(see PERF.md); run on whatever device JAX selects (TPU under axon).
"""

from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache

    _enable_compile_cache()

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.core import multigrid, solver
    from realtimedepthdiffusion_tpu.core.color import rgb_to_gray
    from realtimedepthdiffusion_tpu.core.weights import edge_weights

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
    rgb_d = jnp.asarray(rgb)
    mask_d, value_d = jnp.asarray(mask), jnp.asarray(value)
    gray0 = rgb_to_gray(rgb_d)

    def emit(name, ms, unit="ms", extra=None):
        rec = {"metric": name, "value": round(float(ms), 3), "unit": unit}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    def chained_ms(step, state0, K=8, n=3):
        # Consume via a HOST FETCH of a reduced scalar: block_until_ready
        # over the axon relay does not reliably wait for multi-output
        # programs containing aliased Pallas calls (PERF.md round-5
        # methodology note); a fetch always does.
        def chain(k):
            @jax.jit
            def run(s):
                out = jax.lax.fori_loop(0, k, lambda i, ss: step(ss), s)
                leaves = jax.tree_util.tree_leaves(out)
                return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return run
        f1, fk = chain(1), chain(K)
        float(f1(state0))
        float(fk(state0))
        def env(f):
            best = 1e9
            for _ in range(n):
                t0 = time.perf_counter()
                float(f(state0))
                best = min(best, time.perf_counter() - t0)
            return best * 1000
        return (env(fk) - env(f1)) / (K - 1)

    def cascade_step(cfg, gp):
        def step(state):
            _, s = multigrid.solve_cascade(gp, mask_d, value_d, state, cfg)
            return s
        return step

    # 1. Plain Jacobi cascade, fixed iterations.
    cfg1 = DiffusionConfig(solver="jacobi")
    gp = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg1))(gray0)
    jax.block_until_ready(gp)
    st = multigrid.initial_depth_state(h, w, cfg1)
    ms = chained_ms(cascade_step(cfg1, gp), st)
    emit("config1 jacobi cascade 1080p (fixed 1937 sweeps)", ms)

    # 2. Red-black GS + residual early exit (tolerance honored).
    # tolerance 1e-3 on the RMS residual metric = the round-3 sweep's
    # operating point: beats even the reference's Chebyshev-Jacobi schedule
    # on BOTH wall-clock (~2x) and RMSE-to-truth across the dataset
    # (tools/rb_vs_jacobi.py, PERF.md round-3).
    cfg2 = DiffusionConfig(solver="red_black", early_exit=True, tolerance=1e-3,
                           residual_check_every=25)
    ms = chained_ms(cascade_step(cfg2, gp), multigrid.initial_depth_state(h, w, cfg2))
    emit("config2 red-black GS + early exit 1080p", ms)

    # 3. Edge-aware weight computation from image gradients (finest level).
    def wstep(d):
        wts = edge_weights(gray0, d, 0, 4, cfg1)
        return d + wts.inv_count * jnp.float32(1e-9)
    ms = chained_ms(wstep, st[0], K=64)
    emit("config3 edge-aware Laplacian weights 1080p", ms)

    # 4. Full V-cycle at 1080p.
    cfg4 = DiffusionConfig(multigrid="vcycle")
    def vstep(state):
        _, s = multigrid.solve_vcycle(gp, mask_d, value_d, state, cfg4)
        return s
    ms = chained_ms(vstep, multigrid.initial_depth_state(h, w, cfg4), K=4)
    emit("config4 full V-cycle 1080p (warm cascade + 2 cycles)", ms,
         extra={"within_16ms_budget": bool(ms < 16.0)})

    # 5. Live loop: LOCALIZED incremental re-solve (dirty-window solve at the
    # fine levels + coarse far-field delta, core/incremental.py) + fused haze.
    from realtimedepthdiffusion_tpu.core.incremental import solve_incremental

    cfg5 = DiffusionConfig(incremental_iterations=120)
    _, warm = jax.jit(
        lambda m, v, s: multigrid.solve_cascade(gp, m, v, s, cfg5)
    )(mask_d, value_d, multigrid.initial_depth_state(h, w, cfg5))
    center = jnp.asarray([140, 230], jnp.int32)  # at the first scribble block
    def live_step(state):
        d0, s = solve_incremental(gp, mask_d, value_d, state, center, cfg5)
        out = fx.apply_effect(fx.EFFECT_HAZE, rgb_d, gray0,
                              jnp.clip(d0, 0.0, 255.0), cfg5)
        # tie the WHOLE effect output into the carried state (a single-pixel
        # tap would let XLA dead-code-eliminate most of the effect)
        s0 = s[0] + out.astype(jnp.float32).mean() * jnp.float32(1e-30)
        return (s0,) + tuple(s[1:])
    ms = chained_ms(live_step, warm, K=32)
    emit("config5 live incremental update (windowed) + fused haze 1080p", ms)


if __name__ == "__main__":
    main()
