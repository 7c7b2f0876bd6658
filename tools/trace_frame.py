"""Profiler-based decomposition of the headline frame (run on real TPU).

Captures a ``jax.profiler`` trace of the K-chained worst-case frame (full
cascade + fused defocus, exactly bench.py's program) and prints a per-frame
device-time decomposition from the trace's op timeline: one row per Pallas
kernel (the five level solves + defocus), one row for all XLA glue, and the
timeline's idle gaps.

This is the independent cross-check of tools/ab_frame.py's interleaved-A/B
decomposition: the A/B infers per-piece cost from wall-clock deltas of
truncated programs; the trace reads each op's duration off the device
timeline directly. Round-3 reading (PERF.md): the two instruments agree,
and the device timeline is GAP-FREE (0.004 ms of idle over a 33 ms K=8
chain) — the frame's cost is kernel time, not scheduling.

Usage:  python tools/trace_frame.py [K] [--size 1080p|4k]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, k: int, size: str = "1080p") -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from realtimedepthdiffusion_tpu.config import DiffusionConfig
    from realtimedepthdiffusion_tpu.core import effects as fx
    from realtimedepthdiffusion_tpu.core import multigrid
    from realtimedepthdiffusion_tpu.core.color import rgb_to_gray
    from realtimedepthdiffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = DiffusionConfig()
    h, w = (2160, 3840) if size == "4k" else (1080, 1920)
    # Input image: RTDD_TRACE_IMAGE env var, falling back to the reference
    # dataset when present. The traced workload is branch-free but its
    # data-dependent characteristics differ between a real photo and random
    # pixels, so ALWAYS say which one was used.
    img_path = os.environ.get(
        "RTDD_TRACE_IMAGE", "/root/reference/dataset/images/Dog.jpg"
    )
    try:
        from realtimedepthdiffusion_tpu.io import imread_rgb

        base = imread_rgb(img_path)
        reps = (h // base.shape[0] + 1, w // base.shape[1] + 1, 1)
        rgb = np.tile(base, reps)[:h, :w]
        print(f"input: {img_path} (tiled to {h}x{w})")
    except Exception as e:
        rgb = np.random.default_rng(0).integers(0, 256, (h, w, 3), dtype=np.uint8)
        print(f"input: RANDOM pixels ({img_path}: {e}); "
              "set RTDD_TRACE_IMAGE to trace a real image")
    mask = np.zeros((h, w), bool)
    value = np.zeros((h, w), np.uint8)
    for i, d in enumerate((0, 64, 128, 192, 254)):
        y, x = 120 + 180 * i, 200 + 320 * i
        mask[y : y + 40, x : x + 60] = True
        value[y : y + 40, x : x + 60] = d

    rgb_d = jnp.asarray(rgb)
    mask_d, value_d = jnp.asarray(mask), jnp.asarray(value)
    gpyr = jax.jit(lambda g: multigrid.build_gray_pyramid(g, cfg))(rgb_to_gray(rgb_d))
    jax.block_until_ready(gpyr)
    state0 = multigrid.initial_depth_state(h, w, cfg)

    def frame(state, rgb_arg):
        depth0, state = multigrid.solve_cascade(gpyr, mask_d, value_d, state, cfg)
        out = fx.apply_effect(
            fx.EFFECT_DEFOCUS, rgb_arg, gpyr[0], jnp.clip(depth0, 0.0, 255.0), cfg
        )
        return state, out

    @jax.jit
    def run(state, rgb_arg):
        def body(i, carry):
            return frame(carry[0], rgb_arg)

        return jax.lax.fori_loop(0, k, body, (state, rgb_arg))

    s, out = run(state0, rgb_d)  # compile + warm outside the trace
    _ = float(out.astype(jnp.float32).sum())
    with jax.profiler.trace(trace_dir):
        s, out = run(state0, rgb_d)
        _ = float(out.astype(jnp.float32).sum())


def report(trace_dir: str, k: int) -> None:
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace found under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    dev_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    xs = [e for e in ev if e.get("ph") == "X" and e["pid"] in dev_pids]
    if not xs:
        raise SystemExit("no TPU device events in the trace (ran on CPU?)")
    # The op timeline is the tid with the most events (the other tids carry
    # the enclosing jit_run / module spans).
    by_tid = collections.Counter(e["tid"] for e in xs)
    tid = by_tid.most_common(1)[0][0]
    ops = sorted((e for e in xs if e["tid"] == tid), key=lambda e: e["ts"])

    agg, cnt = collections.Counter(), collections.Counter()
    whole = 0.0
    for e in ops:
        if e["name"].startswith("while."):  # the K-frame loop envelope
            whole = max(whole, e["dur"])
            continue
        agg[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    pallas = {n: d for n, d in agg.items() if n.startswith("closed_call")}
    glue = sum(d for n, d in agg.items() if n not in pallas)

    end, gaps = None, 0.0
    for e in ops:
        if end is not None and e["ts"] > end:
            gaps += e["ts"] - end
        end = max(end or 0.0, e["ts"] + e["dur"])

    print(f"frame envelope: {whole / k / 1e3:.3f} ms/frame  (K={k} chain)")
    print("pallas kernels (per frame; largest first — at the default config "
          "these are L4..L0 solves + defocus):")
    for n, d in sorted(pallas.items(), key=lambda kv: -kv[1]):
        print(f"  {d / k / 1e3:8.3f} ms  x{cnt[n] // k}  {n}")
    print(f"  {sum(pallas.values()) / k / 1e3:8.3f} ms  total pallas")
    print(f"  {glue / k / 1e3:8.3f} ms  XLA glue (annotation pyramids, seeds, "
          "weight planes, pyrUps, pads)")
    print(f"timeline idle gaps: {gaps / 1e3:.3f} ms over the whole chain")


def main() -> None:
    argv = sys.argv[1:]
    size = "1080p"
    if "--size" in argv:
        at = argv.index("--size")
        size = argv[at + 1].lower()
        if size not in ("1080p", "4k"):
            raise SystemExit(f"unknown --size {size!r} (1080p|4k)")
        del argv[at : at + 2]
    k = int(argv[0]) if argv else (4 if size == "4k" else 8)
    trace_dir = tempfile.mkdtemp(prefix="rtdd_trace_")
    capture(trace_dir, k, size)
    report(trace_dir, k)
    print(f"(full trace kept at {trace_dir} — load in TensorBoard/Perfetto)")


if __name__ == "__main__":
    main()
