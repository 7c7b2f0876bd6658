"""Interleaved A/B of the defocus kernel variants at 1080p (PERF.md
methodology; run ON the TPU):

    python tools/ab_defocus.py [K] [reps]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.ab import ab  # noqa: E402


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from bench import _enable_compile_cache

    _enable_compile_cache()

    import jax.numpy as jnp

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    d0 = jnp.asarray(rng.random((h, w), dtype=np.float32) * 255)

    def variant(var, block_h):
        cfg = DiffusionConfig(pallas_defocus_variant=var)

        def step(d):
            out = defocus_pallas(rgb, d, cfg, block_h=block_h)
            # consume the WHOLE output (single-pixel taps get DCE'd)
            return d + out.astype(jnp.float32).mean() * jnp.float32(1e-30)

        return step

    # stacked slab VMEM is ~3x per block row: block 256 is near the 112 MiB
    # cap at 1080p; 360 overflows.
    variants = {
        "corners@360": variant("corners", 360),
        "stacked@128": variant("stacked", 128),
        "stacked@256": variant("stacked", 256),
    }
    ab(variants, d0, K=K, reps=reps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
