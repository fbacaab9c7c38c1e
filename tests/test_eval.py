"""Evaluation metric + render tests."""
import numpy as np
import jax.numpy as jnp

from pointdreamer_tpu.eval import metrics as M
from pointdreamer_tpu.eval.render import render_textured_views
from pointdreamer_tpu.core.camera import make_camera_rig


def test_psnr_ssim_basics(rng):
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    p = np.asarray(M.psnr(jnp.asarray(a), jnp.asarray(a)))
    assert (p > 100).all()
    s = np.asarray(M.ssim(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(s, 1.0, atol=1e-4)
    b = np.clip(a + 0.1, 0, 1).astype(np.float32)
    assert np.asarray(M.psnr(jnp.asarray(a), jnp.asarray(b))).mean() < 30
    assert np.asarray(M.ssim(jnp.asarray(a), jnp.asarray(b))).mean() < 1.0


def test_ssim_matches_magnitude_scipy_free():
    # uniform images with different means -> known SSIM formula value
    a = jnp.full((1, 24, 24, 1), 0.2)
    b = jnp.full((1, 24, 24, 1), 0.4)
    c1 = 0.01 ** 2
    expect = (2 * 0.2 * 0.4 + c1) / (0.2 ** 2 + 0.4 ** 2 + c1)
    np.testing.assert_allclose(np.asarray(M.ssim(a, b))[0], expect,
                               atol=1e-3)


def _cube():
    v = np.array([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                  for z in (-.5, .5)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
    return v, f


def test_chamfer_identity_and_shift():
    v, f = _cube()
    p, n = M.sample_mesh_surface(v, f, 2000, seed=0)
    res = M.chamfer_and_fscore(p, n, p, n)
    assert res["chamfer_l1"] < 1e-6 and res["fscore"] == 1.0
    res2 = M.chamfer_and_fscore(p + 0.05, n, p, n, fscore_thresh=0.01)
    assert res2["chamfer_l1"] > 0.02
    assert res2["fscore"] < 0.9


def test_points_in_mesh_cube():
    v, f = _cube()
    q = np.array([[0, 0, 0], [0.49, 0, 0], [0.6, 0, 0], [0, 0.7, 0]],
                 np.float32)
    inside = M.points_in_mesh(q, v, f)
    np.testing.assert_array_equal(inside, [True, True, False, False])
    iou = M.mesh_iou(v, f, v, f, n_samples=4000)
    assert iou > 0.97


def test_render_textured_views():
    v, f = _cube()
    # trivial single-chart uv: all faces map to the center of a red atlas
    uvs = np.full((8, 2), 0.5, np.float32)
    fuv = f.copy()
    atlas = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (16, 16, 3))
    rig = make_camera_rig(4, distance=3.0, res=64)
    imgs = np.asarray(render_textured_views(
        rig, jnp.asarray(v), jnp.asarray(f), jnp.asarray(uvs),
        jnp.asarray(fuv), atlas, 64))
    assert imgs.shape == (4, 64, 64, 3)
    # center pixel shows the cube (red), corners show background (white)
    assert (imgs[:, 32, 32] == [1, 0, 0]).all()
    # every view has some white background (pole views fill the corners)
    assert ((imgs == 1.0).all(-1).reshape(4, -1).mean(1) > 0.05).all()


def test_renderer_variants():
    """Vertex-color, normal-map, mask, and lit renderers
    (camera_utils.py:379/556/735/857 equivalents)."""
    import jax.numpy as jnp

    from pointdreamer_tpu.core.camera import make_camera_rig
    from pointdreamer_tpu.eval.render import (
        render_mask_views, render_normal_views, render_textured_views,
        render_vertex_color_views)

    # unit cube about the origin
    v = np.array([[x, y, z] for x in (-.4, .4) for y in (-.4, .4)
                  for z in (-.4, .4)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
    rig = make_camera_rig(2, res=64)
    vj, fj = jnp.asarray(v), jnp.asarray(f)

    mask = np.asarray(render_mask_views(rig, vj, fj))
    assert mask.shape == (2, 64, 64)
    assert 0.05 < mask.mean() < 0.9

    vc = np.asarray(render_vertex_color_views(
        rig, vj, fj, jnp.asarray(np.clip(v + 0.5, 0, 1))))
    assert vc.shape == (2, 64, 64, 3)
    assert np.isfinite(vc).all() and vc.min() >= 0 and vc.max() <= 1

    nm = np.asarray(render_normal_views(rig, vj, fj))
    fg = mask.astype(bool)
    enc = nm[fg]           # encoded normals decode to ~unit vectors
    dec = enc * 2 - 1
    assert np.allclose(np.linalg.norm(dec, axis=-1), 1.0, atol=1e-3)

    uvs = np.random.default_rng(0).random((8, 2)).astype(np.float32)
    atlas = jnp.asarray(np.full((32, 32, 3), 0.8, np.float32))
    lit = np.asarray(render_textured_views(
        rig, vj, fj, jnp.asarray(uvs), fj, atlas,
        light_dir=jnp.asarray([0.0, 0.0, 1.0])))
    unlit = np.asarray(render_textured_views(
        rig, vj, fj, jnp.asarray(uvs), fj, atlas))
    # lighting darkens oblique faces; background stays identical
    assert (lit[fg] <= unlit[fg] + 1e-6).all()
    assert np.allclose(lit[~fg], unlit[~fg])
