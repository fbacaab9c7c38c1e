"""JAX runtime setup: persistent compilation cache + platform knobs.

Fresh processes otherwise re-do every XLA compile (20-40 s on TPU, worse
through the remote-compile tunnel); the persistent cache makes the second
process start warm.  Called by Pipeline.create, demo.py and bench.py.
"""
from __future__ import annotations

import os


def _machine_fingerprint() -> str:
    """Short hash of the host CPU feature set.  XLA:CPU AOT executables
    embed the compile machine's features; loading them on a host with a
    different feature set logs SIGILL warnings (cpu_aot_loader.cc) and can
    crash outright.  Keying the cache dir by this fingerprint makes a
    cache populated on one host class invisible to another."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{feats}"
    # NOTE: same-machine cache loads still log benign cpu_aot_loader
    # "feature not supported" errors for +prefer-no-gather/-scatter —
    # those are XLA tuning pseudo-features embedded at compile time that
    # never appear in the raw host feature list.  Real flag mismatches
    # (different host class) are what this fingerprint prevents.
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    if os.environ.get("PD_JAX_CACHE_DISABLE") == "1":
        # XLA:CPU AOT reloads log cpu_aot_loader "feature not supported"
        # errors even on the compile machine (the +prefer-no-gather/-scatter
        # tuning pseudo-features never appear in the host feature list);
        # contexts that must have a loader-noise-free record (the driver's
        # multichip dryrun) disable the persistent cache outright.
        return
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        # the axon remote-compile tunnel hangs when the persistent cache
        # tries to serialize its AOT executables — rely on in-process
        # caching there (bench warms up in-process before timing)
        return
    try:
        cache_dir = cache_dir or os.environ.get(
            "PD_JAX_CACHE", os.path.expanduser("~/.cache/pointdreamer_jax"))
        cache_dir = os.path.join(cache_dir, _machine_fingerprint())
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return  # read-only/unset HOME: run cold rather than fail
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags
