"""Persistent XLA compilation cache.

The Llama-3-8B decode/prefill graphs take ~10 minutes to compile on a
remote-attached TPU; caching compiled executables on disk makes repeat
runs (benchmark rounds, driver re-runs, eval sweeps) start in seconds.
The reference has no equivalent (CUDA kernels are AOT-compiled wheels);
this is the TPU-native analog of shipping prebuilt kernels.

Enabled by default; set OMNISERVE_COMPILE_CACHE=0 to disable or point
JAX_COMPILATION_CACHE_DIR somewhere else (default /tmp/omniserve_jax_cache).
"""

from __future__ import annotations

import os

_enabled = False


def enable_compile_cache() -> None:
    """Idempotently turn on jax's persistent compilation cache."""
    global _enabled
    if _enabled or os.environ.get("OMNISERVE_COMPILE_CACHE", "1") == "0":
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/omniserve_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        _enabled = True
    except Exception:  # older jax / unsupported backend: run uncached
        pass
