"""Benchmark harness (driver contract: prints ONE JSON line on stdout).

Headline metric (BASELINE.md): ms per annotation update at 1080p on one TPU
core — a full coarse-to-fine solve (5 levels, 1937 Jacobi+Chebyshev sweeps:
1000/500/250/125/62) PLUS the fused DEFOCUS effect — the reference's most
expensive kernel (O(k^2) gather, src/GPUDepthEffect.cu:29-72), i.e. the
WORST-CASE frame, the same work the reference performs per frame under
``--live`` with refocus latched (src/main.cpp:190-202,232-295).
``vs_baseline`` = 16 ms target / measured ms (>1 means faster than target).

Methodology: this environment reaches the TPU through a network relay with
~10-30 ms of per-dispatch/fetch RTT that no on-device frame ever pays, so
the harness chains K frames inside ONE compiled program (lax.fori_loop over
the solve+effect step, state carried between frames) and reports
(t(K) - t(1)) / (K - 1): pure per-frame device time, independent of the
relay. Both raw envelopes are printed to stderr for transparency.
"""

from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _enable_compile_cache():
    """Persistent compilation cache (repo-local, gitignored): the first bench
    run pays the ~2-5 min remote compile; subsequent runs start in seconds.
    Delegates to utils.cache so the cache policy lives in ONE place; also
    imported by tools/ab_*.py and tests_tpu/conftest.py."""
    import os

    from realtimedepthdiffusion_tpu.utils.cache import enable_compilation_cache

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    if enable_compilation_cache(cache) is None:
        log("compile cache disabled or unavailable")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.core import multigrid
    from realtimedepthdiffusion_tpu.core.color import rgb_to_gray

    # Driver contract: plain `python bench.py` is the 1080p headline.
    # `--size 4k` measures the same worst-case frame at 2160x3840 (6 levels,
    # defocus max_half 55) for the PERF.md resolution-scaling row.
    h, w, label = 1080, 1920, "1080p"
    if "--size" in sys.argv:
        at = sys.argv.index("--size") + 1
        if at >= len(sys.argv):
            raise SystemExit("--size needs a value (1080p|4k)")
        sz = sys.argv[at].lower()
        if sz in ("4k", "2160p"):
            h, w, label = 2160, 3840, "4K"
        elif sz not in ("1080p", "hd"):
            raise SystemExit(f"unknown --size {sz!r} (1080p|4k)")
    # Opt-in bounded-error defocus (the 4K latency lever; error ledger in
    # PERF.md via tools/defocus_quality_report.py). The driver's bench of
    # record (plain `python bench.py`) stays on the exact default.
    quality = "exact"
    if "--defocus-quality" in sys.argv:
        at = sys.argv.index("--defocus-quality") + 1
        if at >= len(sys.argv) or sys.argv[at] not in ("auto", "exact", "approx"):
            raise SystemExit("--defocus-quality needs a value (auto|exact|approx)")
        quality = sys.argv[at]
    cfg = DiffusionConfig(pallas_defocus_quality=quality)
    log("devices:", jax.devices())

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
    gpyr = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg))(gray0)
    jax.block_until_ready(gpyr)
    state0 = multigrid.initial_depth_state(h, w, cfg)

    def frame(state, rgb_arg):
        """One annotation update: full solve + fused defocus (worst-case
        effect — haze/desaturation frames are strictly cheaper)."""
        depth0, state = multigrid.solve_cascade(gpyr, mask_d, value_d, state, cfg)
        out = fx.apply_effect(
            fx.EFFECT_DEFOCUS, rgb_arg, gpyr[0], jnp.clip(depth0, 0.0, 255.0), cfg
        )
        return state, out

    def chained(k):
        # rgb is an explicit ARGUMENT (not a closure): closed-over device
        # arrays get baked into the executable as constant literals, and XLA
        # then constant-folds rgb.astype(f32) into a (H,W,3) literal whose
        # lane padding (3 -> 128) costs ~1 GB of HBM.
        def run(state, rgb_arg):
            def body(i, carry):
                s, _ = carry
                return frame(s, rgb_arg)
            return jax.lax.fori_loop(0, k, body, (state, rgb_arg))
        return jax.jit(run)

    # K=32 frames per chain: per-frame time is (t(K)-t(1))/(K-1), so every
    # millisecond of relay/queue noise in one envelope pollutes the per-frame
    # figure by 1/(K-1) — doubling K from 16 halved the noise floor of the
    # reported number (the tunnel's weather moved round-2 readings by ~0.3 ms
    # at K=16). Envelopes take the MIN over 5 runs: the noise is strictly
    # additive (RTT + queuing), so the min converges on true device time.
    K = 32 if label == "1080p" else 8  # 4K frames are ~4x bigger
    f1, fk = chained(1), chained(K)

    t0 = time.perf_counter()
    s, out = f1(state0, rgb_d)
    _ = float(out.astype(jnp.float32).sum())
    log(f"compile+first f1: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    s, out = fk(state0, rgb_d)
    _ = float(out.astype(jnp.float32).sum())
    log(f"compile+first f{K}: {time.perf_counter() - t0:.1f}s")

    def envelope(f, n=5):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            s, out = f(state0, rgb_d)
            _ = float(out.astype(jnp.float32).sum())
            best = min(best, time.perf_counter() - t0)
        return best * 1000.0

    t1 = envelope(f1)
    tk = envelope(fk)
    dt_ms = max((tk - t1) / (K - 1), 1e-6)
    log(f"envelope t1={t1:.2f} ms, t{K}={tk:.2f} ms -> per-frame {dt_ms:.3f} ms")

    sweeps = sum(
        cfg.level_iterations(cfg.num_levels(h, w), l)
        for l in range(cfg.num_levels(h, w))
    )
    log(f"sweeps/frame: {sweeps}; sweep throughput: {sweeps / dt_ms * 1000:.0f}/s")

    levels = cfg.num_levels(h, w)
    print(
        json.dumps(
            {
                "metric": f"{label} solve+defocus ms/frame, worst-case effect "
                          f"({sweeps} Chebyshev sweeps, {levels}-level cascade, "
                          "1 TPU core, relay-RTT-excluded"
                          + (f", {quality} defocus" if quality != "exact" else "")
                          + ")",
                "value": round(dt_ms, 3),
                "unit": "ms",
                "vs_baseline": round(16.0 / dt_ms, 3),
            }
        )
    )


def _record_cold_start():
    """Run bench_cold.py in a FRESH subprocess and persist its JSON to
    BENCH_COLD.json next to this file — the per-round cold-start artifact
    (round-4 verdict task #4: a cold-start regression must show up in a
    tracked number, not a stderr line). Failures are reported but never
    break the headline bench (the driver contract is ONE stdout line)."""
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench_cold.py"),
             "--fused-wait", "240"],
            capture_output=True, text=True, timeout=900,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        data = json.loads(line)
    except Exception as e:  # noqa: BLE001 - diagnostics only
        log(f"cold-start bench failed: {e!r}")
        return
    with open(os.path.join(here, "BENCH_COLD.json"), "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    log(f"cold start: {data['detail']}  -> BENCH_COLD.json")


if __name__ == "__main__":
    main()
    if "--no-cold" not in sys.argv:
        _record_cold_start()
