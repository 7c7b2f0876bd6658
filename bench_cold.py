"""Cold-start benchmark: time-to-first-depth in a FRESH process.

The interactive contract the reference ships (instant start: main() loads,
allocates, and is solving within the first UI tick — src/main.cpp:64-178)
maps here to the fast_start staged path: per-level programs compile in
parallel and serve the first solve while the fused whole-cascade program
compiles in the background (pipeline.py:327-356, PERF.md "Startup").

This harness measures, in a fresh python process at the headline 1080p
geometry with fast_start ON:

- ``import_s``        process start -> framework imported, backend up
- ``first_solve_s``   annotation ready -> first depth-u8 readback complete
                      (the staged path; the number a user FEELS at startup)
- ``time_to_first_depth_s``  process start -> that same readback (includes
                      imports + pyramid build + staged compile)
- ``fused_switch_s``  process start -> the background fused executable
                      landed (solves switch to one-dispatch frames); null
                      if it hasn't landed within the wait cap

Contract (PERF.md "Startup"): staged first solve < 5 s with a warm
compilation cache; < 60 s on a cold tunnel. The driver-facing wrapper in
bench.py runs this file as a subprocess each round and records the JSON to
BENCH_COLD.json, so a cold-start regression shows up as a tracked artifact
(round-4 verdict task #4) instead of a stderr line.

Prints ONE JSON line on stdout (same shape as bench.py's contract).
"""

from __future__ import annotations

import json
import os
import sys
import time

T_PROC = time.perf_counter()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("RTDD_FAST_START", "1")
    wait_cap = 300.0
    if "--fused-wait" in sys.argv:
        wait_cap = float(sys.argv[sys.argv.index("--fused-wait") + 1])

    import numpy as np

    from realtimedepthdiffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    import jax
    import jax.numpy as jnp

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.pipeline import DepthPipeline

    cfg = DiffusionConfig(fast_start=True)
    h, w = 1080, 1920
    t_import = time.perf_counter() - T_PROC
    log(f"import+backend: {t_import:.2f}s; devices: {jax.devices()}")

    pipe = DepthPipeline(h, w, cfg)
    pipe.prewarm_async()  # the session constructor's kick (session.py:53)

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    rgb_d, gpyr = pipe.prepare_image(rgb)

    mask = np.zeros((h, w), bool)
    value = np.zeros((h, w), np.uint8)
    for i, d in enumerate((0, 64, 128, 192, 254)):
        y, x = 120 + 180 * i, 200 + 320 * i
        mask[y : y + 40, x : x + 60] = True
        value[y : y + 40, x : x + 60] = d

    t0 = time.perf_counter()
    depth, state = pipe.solve(
        gpyr, jnp.asarray(mask), jnp.asarray(value), pipe.initial_state()
    )
    u8 = np.asarray(pipe.depth_u8(depth))  # host readback completes the frame
    first_solve_s = time.perf_counter() - t0
    ttfd_s = time.perf_counter() - T_PROC
    assert u8.shape == (h, w) and u8[mask].size  # a real depth map came back
    log(f"first solve (staged): {first_solve_s:.2f}s; "
        f"time-to-first-depth: {ttfd_s:.2f}s")

    fused_switch_s = None
    if pipe.wait_fused(timeout=wait_cap):
        fused_switch_s = time.perf_counter() - T_PROC
        log(f"fused executable landed at {fused_switch_s:.2f}s")
    else:
        log(f"fused compile did not land within {wait_cap:.0f}s (reported null)")

    print(json.dumps({
        "metric": "1080p cold start: fresh-process time-to-first-depth "
                  "(fast_start staged path, warm .jax_cache)",
        "value": round(ttfd_s, 2),
        "unit": "s",
        "vs_baseline": round(5.0 / max(first_solve_s, 1e-9), 3),
        "detail": {
            "import_s": round(t_import, 2),
            "first_solve_s": round(first_solve_s, 2),
            "time_to_first_depth_s": round(ttfd_s, 2),
            "fused_switch_s": (
                round(fused_switch_s, 2) if fused_switch_s is not None else None
            ),
            "contract": "staged first solve < 5 s warm cache / < 60 s cold tunnel",
        },
    }))


if __name__ == "__main__":
    main()
