"""JAX runtime setup: persistent compilation cache + platform knobs.

Fresh processes otherwise re-do every XLA compile (20-40 s on TPU, worse
through the remote-compile tunnel); the persistent cache makes the second
process start warm.  Called by Pipeline.create, demo.py and bench.py.
"""
from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        # the axon remote-compile tunnel hangs when the persistent cache
        # tries to serialize its AOT executables — rely on in-process
        # caching there (bench warms up in-process before timing)
        return
    cache_dir = cache_dir or os.environ.get(
        "PD_JAX_CACHE", os.path.expanduser("~/.cache/pointdreamer_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags
