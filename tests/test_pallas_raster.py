"""Pallas rasterizers (interpret mode) must match the XLA rasterizer."""
import numpy as np
import jax.numpy as jnp

from pointdreamer_tpu.ops import raster as orast
from pointdreamer_tpu.kernels.raster_pallas import (
    rasterize_pallas, rasterize_views_binned_pallas)


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

def test_binned_pallas_matches_bruteforce_views():
    """Binned hybrid kernel (XLA binning + Mosaic z-loop), 2 views, with a
    few triangles big enough to land on the big-face side list."""
    rng = np.random.default_rng(11)
    n_small, n_big = 150, 8
    c = rng.uniform(-0.9, 0.9, (n_small, 1, 2))
    offs = rng.uniform(-0.15, 0.15, (n_small, 3, 2))
    small = c + offs
    cb = rng.uniform(-0.5, 0.5, (n_big, 1, 2))
    offb = rng.uniform(-0.9, 0.9, (n_big, 3, 2))
    tris = np.concatenate([small, cb + offb], 0)
    n_tris = n_small + n_big
    tri = tris.reshape(-1, 2).astype(np.float32)
    depth = rng.uniform(0.5, 2.0, (n_tris, 1)).repeat(3, 1).reshape(-1)
    depth = (depth + rng.uniform(-0.05, 0.05, depth.shape)).astype(np.float32)
    faces = np.arange(n_tris * 3).reshape(-1, 3).astype(np.int32)

    res = 128
    ndc2 = np.stack([tri, tri[:, ::-1]], 0)          # 2 "views"
    dep2 = np.stack([depth, depth], 0)
    b = rasterize_views_binned_pallas(
        jnp.asarray(ndc2), jnp.asarray(dep2), jnp.asarray(faces), res,
        interpret=True)
    for v in range(2):
        a = orast.rasterize(jnp.asarray(ndc2[v]), jnp.asarray(dep2[v]),
                            jnp.asarray(faces), res, chunk=64)
        fa = np.asarray(a.face_id)
        fb = np.asarray(b.face_id)[v]
        np.testing.assert_array_equal(fa >= 0, fb >= 0)
        assert (fa != fb).mean() < 1e-3
        za = np.asarray(a.zbuf)
        zb = np.asarray(b.zbuf)[v]
        both = np.isfinite(za) & np.isfinite(zb)
        # the kernel evaluates z as an affine plane (Az*x+Bz*y+Cz), the
        # reference interpolates barycentrically — same plane, different
        # rounding
        np.testing.assert_allclose(za[both], zb[both], atol=1e-3)
        same = both & (fa == fb)
        np.testing.assert_allclose(np.asarray(a.bary)[same],
                                   np.asarray(b.bary)[v][same], atol=1e-3)
