"""Interleaved A/B of the 4K L0 solve (2160x3840, 62 sweeps): the u8
derived-weights arena megakernel (the default route at 4K, where the f32
weight arena overflows VMEM) vs the per-step-DMA fallback that round 2
measured at 26-46 ms (PERF.md). Run ON the TPU:

    python tools/ab_4k.py [K] [reps] [iters]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.ab import ab  # noqa: E402


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 62

    from bench import _enable_compile_cache

    _enable_compile_cache()

    import jax.numpy as jnp

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    import realtimedepthdiffusion_tpu.ops.pallas_sweep as ps

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    mask = jnp.asarray(rng.random((h, w)) < 0.001)
    d0 = jnp.asarray(rng.random((h, w), dtype=np.float32) * 255)

    def solve(cfg):
        def step(d):
            return ps.solve_level_strips(d, mask, gray, 0, 5, iters, cfg)

        return step

    # Default: f32 arena overflows at 4K -> derived-weights u8 arena.
    # cap=0 also rejects the u8 arena -> round 2's per-step-DMA fallback.
    # k=12/16 arms: deeper iteration blocks amortize the per-grid-step
    # in-kernel weight materialization (~40 VPU ops/px) over more sweeps,
    # at the cost of more halo rows (pad_rows 16 -> 24).
    ab(
        {
            "uarena-k8": solve(DiffusionConfig(pallas_iter_block_uarena=8)),
            "uarena-k12": solve(DiffusionConfig()),  # shipped default
            "uarena-k16": solve(DiffusionConfig(pallas_iter_block_uarena=16)),
            "dma-fallback": solve(DiffusionConfig(pallas_arena_vmem_cap=0)),
        },
        d0, K=K, reps=reps,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
