"""Pallas rasterizer (interpret mode) must match the XLA rasterizer."""
import numpy as np
import jax.numpy as jnp

from pointdreamer_tpu.ops import raster as orast
from pointdreamer_tpu.kernels.raster_pallas import rasterize_pallas


def test_pallas_matches_bruteforce(rng=np.random.default_rng(7)):
    n_tris = 80
    c = rng.uniform(-0.9, 0.9, (n_tris, 1, 2))
    offs = rng.uniform(-0.2, 0.2, (n_tris, 3, 2))
    tri = (c + offs).reshape(-1, 2).astype(np.float32)
    depth = rng.uniform(0.5, 2.0, (n_tris, 1)).repeat(3, 1).reshape(-1)
    depth = (depth + rng.uniform(-0.05, 0.05, depth.shape)).astype(np.float32)
    faces = np.arange(n_tris * 3).reshape(-1, 3).astype(np.int32)

    res = 128
    a = orast.rasterize(jnp.asarray(tri), jnp.asarray(depth),
                        jnp.asarray(faces), res, chunk=64)
    b = rasterize_pallas(jnp.asarray(tri), jnp.asarray(depth),
                         jnp.asarray(faces), res, interpret=True)
    fa, fb = np.asarray(a.face_id), np.asarray(b.face_id)
    np.testing.assert_array_equal(fa >= 0, fb >= 0)
    assert (fa != fb).mean() < 1e-3
    both = np.isfinite(np.asarray(a.zbuf)) & np.isfinite(np.asarray(b.zbuf))
    np.testing.assert_allclose(np.asarray(a.zbuf)[both],
                               np.asarray(b.zbuf)[both], atol=1e-4)
    same = both & (fa == fb)
    np.testing.assert_allclose(np.asarray(a.bary)[same],
                               np.asarray(b.bary)[same], atol=1e-4)
