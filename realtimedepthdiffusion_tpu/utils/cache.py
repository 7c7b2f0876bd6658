"""Persistent XLA compilation cache for the product surfaces.

The reference binary pays no startup compile (CUDA kernels ship compiled,
src/GPUSolver.cu); a JAX process pays the full-cascade XLA compile per image
shape on every cold start — minutes over a remote-device tunnel. Enabling
jax's persistent compilation cache makes every surface (CLI, GUI, serving)
start in seconds after the first run, which is what a production tool must
do. Opt out with RTDD_NO_COMPILE_CACHE=1; relocate with RTDD_CACHE_DIR.
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    env = os.environ.get("RTDD_CACHE_DIR")
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(base, "realtimedepthdiffusion_tpu", "xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache. Returns the
    directory used, or None when disabled/unavailable (the cache is an
    optimization, never a requirement — failures are swallowed)."""
    if os.environ.get("RTDD_NO_COMPILE_CACHE", "").lower() not in ("", "0", "false"):
        return None
    cache = cache_dir or default_cache_dir()
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache
    except Exception:
        return None
