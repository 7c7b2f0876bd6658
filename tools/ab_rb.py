"""Interleaved A/B of the red-black megakernel formulations at 1080p
(PERF.md methodology; run ON the TPU):

    python tools/ab_rb.py [K] [reps] [iters]

Arms: masked full-width (round-2 kernel: two full-plane relaxations per
iteration), quadrant-compacted (each color updates only its own quarter
planes), and the plain-Jacobi strip megakernel at the same iteration count
for context (config #1 vs #2 per-iteration cost).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.ab import ab  # noqa: E402


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 62

    from bench import _enable_compile_cache

    _enable_compile_cache()

    import jax.numpy as jnp

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    import realtimedepthdiffusion_tpu.ops.pallas_sweep as ps

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    mask = jnp.asarray(rng.random((h, w)) < 0.001)
    d0 = jnp.asarray(rng.random((h, w), dtype=np.float32) * 255)

    def rb(compact):
        cfg = DiffusionConfig(solver="red_black", early_exit=False,
                              pallas_rb_compact=compact)

        def step(d):
            return ps.solve_level_red_black_pallas(
                d, mask, gray, 0, 4, iters, cfg
            )

        return step

    def jacobi(d):
        return ps.solve_level_strips(d, mask, gray, 0, 4, iters,
                                     DiffusionConfig())

    ab(
        {
            "rb-masked": rb(False),
            "rb-compact": rb(True),
            "jacobi": jacobi,
        },
        d0, K=K, reps=reps,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
