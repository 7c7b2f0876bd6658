"""Iters-scaling probe for the VMEM-resident kernel (round 3).

tools/ab_levels.py measured the three coarse levels at ~0.95 ms in-context —
~4x their aggregate VPU roofline (~0.24 ms) while the L0 strip megakernel
runs at ~80% of the same roofline. This probe separates, per level shape,
the PER-SWEEP cost (slope between two iteration counts) from the FIXED cost
(launch + weight-plane build + pad/crop glue, the intercept):

    per-sweep = (t(full) - t(lo)) / (full - lo)
    fixed     = t(lo) - lo * per-sweep

Each arm chains a full solve_level_resident call (weights rebuilt per call,
as the cascade does) with state carried, K=16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_resident_scaling.py
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
    levels = [  # (name, h, w, full_iters) — the 1080p cascade's coarse levels
        ("L2 270x480", 270, 480, 250),
        ("L3 135x240", 135, 240, 500),
        ("L4 67x120", 67, 120, 1000),
    ]

    for name, h, w, full in levels:
        gray = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8).astype(np.float32))
        mask = jnp.asarray(rng.random((h, w)) < 0.02)
        lo = max(full // 10, 1)

        def arm(iters):
            def step(carry):
                d, acc = carry
                out = ps.solve_level_resident(d, mask, gray, 1, 4, iters, cfg)
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
            f"{slope_us:.3f} us/sweep, fixed {fixed_ms:.3f} ms"
        )


if __name__ == "__main__":
    main()
