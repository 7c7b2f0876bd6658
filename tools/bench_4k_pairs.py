"""Per-pair 4K worst-case frame bench: solve + EXACT fused defocus on the
12 dataset pairs bilinearly upscaled to 2160x3840 (the round-4 verdict's
acceptance case for task #1: exact-quality 4K defocus under the 16 ms
interactive budget via per-strip candidate banding).

Every pair shares the 4K geometry, so ONE compiled program serves all 12 —
only the data (image pyramid + annotation) changes. Per-frame time uses the
K-chained methodology (PERF.md "Measurement methodology"). The synthetic
full-ramp worst case (every candidate in every strip — banding can't help)
rides along, reported honestly.

Run ON the TPU:  python tools/bench_4k_pairs.py [--k 6] [--quality exact]
Output: markdown table for PERF.md.
"""

from __future__ import annotations

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _enable_compile_cache  # noqa: E402

DATASET = "/root/reference/dataset"


def upscale_pair(rgb, mask, value, h, w):
    from PIL import Image

    img = np.asarray(Image.fromarray(rgb).resize((w, h), Image.BILINEAR))
    m = np.asarray(
        Image.fromarray(mask.astype(np.uint8) * 255).resize((w, h), Image.NEAREST)
    ) > 0
    v = np.asarray(Image.fromarray(value).resize((w, h), Image.NEAREST))
    return img, m, np.where(m, v, 0).astype(np.uint8)


def main() -> int:
    _enable_compile_cache()

    K = 6
    if "--k" in sys.argv:
        K = int(sys.argv[sys.argv.index("--k") + 1])
    quality = "exact"
    if "--quality" in sys.argv:
        quality = sys.argv[sys.argv.index("--quality") + 1]

    import jax
    import jax.numpy as jnp
    from jax import lax

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.core import multigrid
    from realtimedepthdiffusion_tpu.core.color import rgb_to_gray
    from realtimedepthdiffusion_tpu.io import imread_rgb, load_annotation

    h, w = 2160, 3840
    cfg = DiffusionConfig(pallas_defocus_quality=quality)
    state0 = multigrid.initial_depth_state(h, w, cfg)

    def frame(gpyr, mask_d, value_d, state, rgb_arg):
        depth0, state = multigrid.solve_cascade(gpyr, mask_d, value_d, state, cfg)
        out = fx.apply_effect(
            fx.EFFECT_DEFOCUS, rgb_arg, gpyr[0], jnp.clip(depth0, 0.0, 255.0), cfg
        )
        return state, out

    def chained(k):
        @jax.jit
        def run(gpyr, mask_d, value_d, state, rgb_arg):
            def body(i, carry):
                s, _ = carry
                return frame(gpyr, mask_d, value_d, s, rgb_arg)

            return lax.fori_loop(0, k, body, (state, rgb_arg))

        return run

    f1, fk = chained(1), chained(K)
    build_gp = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg))

    def cases():
        for img_path in sorted(glob.glob(f"{DATASET}/images/*.jpg")):
            name = os.path.splitext(os.path.basename(img_path))[0]
            ann = f"{DATASET}/annotations/{name}.png"
            if not os.path.exists(ann):
                continue
            rgb = imread_rgb(img_path)
            mask, value = load_annotation(ann)
            yield name, *upscale_pair(rgb, mask, value, h, w)
        # Synthetic full near-to-far ramp: every candidate in every strip.
        rgb = np.zeros((h, w, 3), np.uint8)
        rgb[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        rgb[..., 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
        m = np.zeros((h, w), bool)
        v = np.zeros((h, w), np.uint8)
        m[:, :64] = True  # near strip at the left edge
        m[:, -64:] = True
        v[:, -64:] = 254
        yield "SyntheticRamp", rgb, m, v

    print(f"| pair (4K) | ms/frame solve+defocus ({quality}) |")
    print("|---|---|")
    worst_real = 0.0
    for name, rgb, mask, value in cases():
        rgb_d = jnp.asarray(rgb)
        gpyr = build_gp(rgb_to_gray(rgb_d))
        mask_d, value_d = jnp.asarray(mask), jnp.asarray(value)
        args = (gpyr, mask_d, value_d, state0, rgb_d)

        # Consume via a HOST FETCH of an on-device scalar reduce:
        # block_until_ready over the axon relay returns without waiting for
        # the computation (measured sub-ms walls for 15 ms frames), so only
        # a fetch gives a true envelope (bench.py methodology).
        def consume(f):
            s, out = f(*args)
            return float(out.astype(jnp.float32).sum())

        consume(f1)
        consume(fk)

        def env(f, n=4):
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                consume(f)
                best = min(best, time.perf_counter() - t0)
            return best * 1000.0

        dt = max((env(fk) - env(f1)) / (K - 1), 1e-6)
        print(f"| {name} | {dt:.2f} |")
        sys.stdout.flush()
        if name != "SyntheticRamp":
            worst_real = max(worst_real, dt)
    print(f"\nworst real pair: {worst_real:.2f} ms (budget 16 ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
