"""Test harness: CPU JAX with a virtual 8-device mesh for sharding tests."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the container's axon sitecustomize pins JAX_PLATFORMS=axon (real TPU);
# tests must run on the virtual 8-device CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

# persistent machine-keyed compile cache: XLA:CPU compiles dominate the
# suite's wall time on the 1-core hosts (the e2e cube test alone pays
# ~2.5 min of compiles cold); a repeat run on the same host class skips
# them.  The fingerprinted dir (core/runtime.py) can't serve another
# host's AOT executables, so no cross-machine SIGILL risk.
from pointdreamer_tpu.core.runtime import setup_jax  # noqa: E402

try:
    setup_jax()
except Exception:
    pass  # unwritable HOME etc.: the suite merely runs cold

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def demo_ply(tmp_path_factory):
    """A small synthetic colored point cloud sampled from a cube surface."""
    rng = np.random.default_rng(42)
    n = 4000
    # sample on unit-cube surface
    face = rng.integers(0, 6, n)
    uv = rng.random((n, 2)) - 0.5
    pts = np.zeros((n, 3), dtype=np.float32)
    axis = face % 3
    sign = np.where(face < 3, 0.5, -0.5)
    for i in range(n):
        a = axis[i]
        o = [0, 1, 2]
        o.remove(a)
        pts[i, a] = sign[i]
        pts[i, o[0]] = uv[i, 0]
        pts[i, o[1]] = uv[i, 1]
    rgb = ((pts + 0.5) * 255).astype(np.uint8)
    path = tmp_path_factory.mktemp("data") / "cube.ply"
    from pointdreamer_tpu.core.io import save_colored_pc_ply

    save_colored_pc_ply(pts, rgb, str(path))
    return str(path)
