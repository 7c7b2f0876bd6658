"""Interleaved A/B of the exact vs bounded-error ('approx') defocus kernel
at 4K (2160x3840, max_half 110 regime) — the round-3 verdict's 4K lever.
The approx arms march the subsampled candidate set (every half up to
exact_upto, then stride q): candidate count 110 -> ~39 at stride 4, so the
marching traffic (the kernel's roofline, PERF.md) drops ~2.8x. Error ledger:
tools/defocus_quality_report.py. Run ON the TPU:

    python tools/ab_defocus_quality.py [K] [reps]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.ab import ab  # noqa: E402


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from bench import _enable_compile_cache

    _enable_compile_cache()

    import jax.numpy as jnp

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.ops.pallas_defocus import defocus_pallas

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    # Full near-to-far ramp: every candidate half-width occurs.
    d0 = jnp.asarray(
        np.broadcast_to(np.linspace(0, 255, w, dtype=np.float32), (h, w)).copy()
    )

    def variant(cfg):
        def step(d):
            out = defocus_pallas(rgb, d, cfg)
            # consume the WHOLE output (single-pixel taps get DCE'd)
            return d + out.astype(jnp.float32).mean() * jnp.float32(1e-30)

        return step

    ab(
        {
            "exact": variant(DiffusionConfig(pallas_defocus_quality="exact")),
            "approx-s2": variant(DiffusionConfig(
                pallas_defocus_quality="approx", pallas_defocus_stride=2)),
            "approx-s4": variant(DiffusionConfig(
                pallas_defocus_quality="approx", pallas_defocus_stride=4)),
            "approx-s8": variant(DiffusionConfig(
                pallas_defocus_quality="approx", pallas_defocus_stride=8)),
        },
        d0, K=K, reps=reps,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
