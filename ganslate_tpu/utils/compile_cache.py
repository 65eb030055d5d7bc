"""Persistent XLA compilation cache.

The big programs in this repo (the k-step fused train scan, the 28-window
sliding-window inferer) each take minutes to compile through the relay
backend; the cache makes every re-compile of an unchanged program a disk
read (measured: 0.02 s vs minutes, fresh process, axon TPU backend).
`bench.py` and the tools/ entry points call :func:`enable` before building
anything so repeat runs — including the driver's end-of-round capture —
pay each compile once ever, not once per process.

Reference counterpart: none (torch eager has no compile step to cache);
this is TPU-native operational plumbing.
"""

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache. Idempotent; safe to call
    before or after backend init (the cache is consulted at compile time).
    Honors JAX_COMPILATION_CACHE_DIR if already set in the environment."""
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took >=1s to compile: the programs we care
    # about take minutes; tiny utility jits stay out of the cache dir.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
