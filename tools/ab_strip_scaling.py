"""Iters-scaling probe for the strip megakernel at L0/L1 shapes (round 3).

Companion to tools/ab_resident_scaling.py: splits the fine levels' in-context
cost (tools/ab_levels.py: L0 1.33 ms / L1 0.66 ms) into per-sweep slope and
fixed intercept (launch + weight-plane build + arena load). The quiet-window
claim of 12 us/sweep at L0 (PERF.md speed-of-light section) is tested here
with the median-based interleaved methodology instead of min-based chains.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_strip_scaling.py
"""

from __future__ import annotations

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
    from realtimedepthdiffusion_tpu.ops import pallas_sweep as ps
    from tools.ab import ab

    cfg = DiffusionConfig()
    rng = np.random.default_rng(0)
    levels = [  # (name, h, w, full_iters, lo_iters)
        ("L0 1080x1920", 1080, 1920, 62, 12),
        ("L1 540x960", 540, 960, 125, 25),
    ]

    for name, h, w, full, lo in levels:
        gray = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8).astype(np.float32))
        mask = jnp.asarray(rng.random((h, w)) < 0.02)

        def arm(iters):
            def step(carry):
                d, acc = carry
                out = ps.solve_level_strips(d, mask, gray, 0, 4, iters, cfg)
                return out, acc + out.sum()

            return step

        d0 = jnp.where(mask, 128.0, 0.0).astype(jnp.float32)
        res = ab(
            {f"{name} iters={n}": arm(n) for n in (lo, full)},
            (d0, jnp.float32(0.0)),
            K=16,
            reps=4,
            verbose=False,
        )
        t_lo = res[f"{name} iters={lo}"]
        t_hi = res[f"{name} iters={full}"]
        slope_us = (t_hi - t_lo) / (full - lo) * 1000.0
        fixed_ms = t_lo - lo * slope_us / 1000.0
        print(
            f"{name}: full({full})={t_hi:.3f} ms, lo({lo})={t_lo:.3f} ms -> "
            f"{slope_us:.2f} us/sweep, fixed {fixed_ms:.3f} ms"
        )


if __name__ == "__main__":
    main()
