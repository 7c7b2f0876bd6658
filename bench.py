"""Benchmark harness (driver contract: prints ONE JSON line on stdout).

Headline metric (BASELINE.md): ms per annotation update at 1080p on one TPU
core — a full coarse-to-fine solve (5 levels, 1937 Jacobi+Chebyshev sweeps:
1000/500/250/125/62) PLUS the fused haze effect, the same work the reference
performs per frame under ``--live`` (src/main.cpp:232-295).
``vs_baseline`` = 16 ms target / measured ms (>1 means faster than target).

Diagnostics go to stderr; stdout carries exactly one JSON line.
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

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.pipeline import DepthPipeline

    h, w = 1080, 1920
    cfg = DiffusionConfig()
    log("devices:", jax.devices())

    # Deterministic 1080p input: tiled dataset image when available, else a
    # smoothed random field (timing is iteration-count-bound either way).
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

    pipe = DepthPipeline(h, w, cfg)
    rgb_d, gpyr = pipe.prepare_image(rgb)
    mask_d, value_d = jnp.asarray(mask), jnp.asarray(value)
    state = pipe.initial_state()

    t0 = time.perf_counter()
    depth, state, out = pipe.solve_and_effect(
        fx.EFFECT_HAZE, gpyr, rgb_d, mask_d, value_d, state
    )
    jax.block_until_ready((depth, out))
    _sync = float(depth.sum())  # force full device->host round trip
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")

    # Timed runs: chained through the depth state (serial dependency), ended
    # by a scalar fetch so asynchronous dispatch cannot hide work.
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        depth, state, out = pipe.solve_and_effect(
            fx.EFFECT_HAZE, gpyr, rgb_d, mask_d, value_d, state
        )
    _sync = float(depth.sum()) + int(out[0, 0, 0])
    dt_ms = (time.perf_counter() - t0) * 1000.0 / iters
    log(f"ms/frame over {iters} runs: {dt_ms:.3f}")

    sweeps = sum(
        cfg.level_iterations(cfg.num_levels(h, w), l)
        for l in range(cfg.num_levels(h, w))
    )
    log(f"sweeps/frame: {sweeps}; sweep throughput: {sweeps / dt_ms * 1000:.0f}/s")

    print(
        json.dumps(
            {
                "metric": "1080p solve+effect ms/frame (1937 Chebyshev sweeps, 5-level cascade, 1 TPU core)",
                "value": round(dt_ms, 3),
                "unit": "ms",
                "vs_baseline": round(16.0 / dt_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
