"""Tiled rasterizer must agree with the brute-force reference rasterizer."""
import numpy as np
import jax.numpy as jnp

from pointdreamer_tpu.ops import raster as orast


def _random_mesh(rng, n_tris=200):
    # random small triangles across the ndc square with varying depth
    c = rng.uniform(-0.9, 0.9, (n_tris, 1, 2))
    offs = rng.uniform(-0.15, 0.15, (n_tris, 3, 2))
    tri = (c + offs).reshape(-1, 2).astype(np.float32)
    depth = rng.uniform(0.5, 2.0, (n_tris, 1)).repeat(3, 1).reshape(-1)
    depth += rng.uniform(-0.05, 0.05, depth.shape)
    faces = np.arange(n_tris * 3).reshape(-1, 3).astype(np.int32)
    return tri, depth.astype(np.float32), faces


def test_tiled_matches_bruteforce():
    rng = np.random.default_rng(3)
    tri, depth, faces = _random_mesh(rng)
    res = 128
    a = orast.rasterize(jnp.asarray(tri), jnp.asarray(depth),
                        jnp.asarray(faces), res, chunk=64)
    b = orast.rasterize_tiled(jnp.asarray(tri), jnp.asarray(depth),
                              jnp.asarray(faces), res, tile=32,
                              max_faces_per_tile=256)
    fa, fb = np.asarray(a.face_id), np.asarray(b.face_id)
    za, zb = np.asarray(a.zbuf), np.asarray(b.zbuf)
    # identical coverage
    np.testing.assert_array_equal(fa >= 0, fb >= 0)
    # same winner except where two faces are z-equal within fp noise
    diff = fa != fb
    assert diff.mean() < 1e-3
    both = (fa >= 0) & np.isfinite(za) & np.isfinite(zb)
    np.testing.assert_allclose(za[both], zb[both], atol=1e-4)
    ba, bb = np.asarray(a.bary), np.asarray(b.bary)
    same = both & ~diff
    np.testing.assert_allclose(ba[same], bb[same], atol=1e-4)


def test_tile_candidate_overflow_headroom():
    # decimated-mesh-like density: 5000 faces at 256 res, tile 32
    rng = np.random.default_rng(4)
    tri, depth, faces = _random_mesh(rng, 5000)
    px = (tri * 0.5 + 0.5) * 256
    fmin = np.floor(px[faces].min(1) / 32).astype(int)
    fmax = np.floor(px[faces].max(1) / 32).astype(int)
    counts = np.zeros((8, 8), int)
    for (x0, y0), (x1, y1) in zip(fmin, fmax):
        counts[max(y0, 0):y1 + 1, max(x0, 0):x1 + 1] += 1
    assert counts.max() < 512, counts.max()


def test_backface_culling_preserves_closed_mesh_render():
    import jax.numpy as jnp
    from pointdreamer_tpu.ops import iso as oiso
    from pointdreamer_tpu.core.camera import make_camera_rig

    res = 25
    axis = np.linspace(-0.6, 0.6, res, dtype=np.float32)
    g = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.4
    verts, faces = oiso.marching_tets(sdf.astype(np.float32), axis)
    rig = make_camera_rig(2, distance=1.6, res=64)
    ndc, depth = rig.transform(jnp.asarray(verts))
    a = orast.rasterize_tiled(ndc[0], depth[0],
                              jnp.asarray(faces, jnp.int32), 64,
                              max_faces_per_tile=8192,
                              cull_backface=False)
    b = orast.rasterize_tiled(ndc[0], depth[0],
                              jnp.asarray(faces, jnp.int32), 64,
                              max_faces_per_tile=8192,
                              cull_backface=True)
    fa, fb = np.asarray(a.face_id), np.asarray(b.face_id)
    # near-identical coverage (grazing edge-on faces may differ) and winners
    assert ((fa >= 0) != (fb >= 0)).mean() < 0.005
    assert (fa != fb).mean() < 0.01


def test_many_big_faces_side_list():
    """A layout with hundreds of footprint-exceeding triangles must not
    lose coverage: the fixed 64-slot side list silently dropped the
    excess (flat-feature meshes -> uncovered atlas/view regions)."""
    import jax.numpy as jnp

    from pointdreamer_tpu.ops import raster as R

    rng = np.random.default_rng(0)
    res = 256
    n_tri = 200
    # large triangles (~1/3 of the screen each) scattered everywhere
    c = rng.uniform(-0.8, 0.8, (n_tri, 1, 2))
    offs = rng.uniform(-0.45, 0.45, (n_tri, 3, 2))
    verts = (c + offs).reshape(-1, 2).astype(np.float32)
    faces = np.arange(3 * n_tri, dtype=np.int64).reshape(-1, 3)
    depth = rng.uniform(1.0, 2.0, (len(verts),)).astype(np.float32)

    nd = jnp.asarray(verts)[None]
    dd = jnp.asarray(depth)[None]
    out_tiled = R.rasterize_views(nd, dd, jnp.asarray(faces), res)
    out_brute = R.rasterize(jnp.asarray(verts), jnp.asarray(depth),
                            jnp.asarray(faces, jnp.int32), res)
    fa = np.asarray(out_tiled.face_id[0])
    fb = np.asarray(out_brute.face_id)
    assert (fb >= 0).mean() > 0.5          # scene covers most pixels
    # identical coverage and face selection
    np.testing.assert_array_equal(fa >= 0, fb >= 0)
    assert (fa == fb).mean() > 0.999
