"""Unit tests for ops: knn, image ops, rasterizer, iso-surface, sdf."""
import os

import numpy as np
import jax.numpy as jnp
import jax
import pytest

from pointdreamer_tpu.ops import image as oimg
from pointdreamer_tpu.ops import knn as oknn
from pointdreamer_tpu.ops import raster as orast
from pointdreamer_tpu.ops import iso as oiso
from pointdreamer_tpu.ops import sdf as osdf
from pointdreamer_tpu.ops import splat as osplat


# ------------------------------- knn --------------------------------------

def test_knn_matches_scipy(rng):
    from scipy.spatial import cKDTree

    ref = rng.standard_normal((500, 3)).astype(np.float32)
    q = rng.standard_normal((173, 3)).astype(np.float32)
    d, i = oknn.knn(jnp.asarray(q), jnp.asarray(ref), 5)
    tree = cKDTree(ref)
    sd, si = tree.query(q, k=5)
    np.testing.assert_allclose(np.sqrt(np.asarray(d)), sd, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), si)


def test_knn_ref_valid_mask(rng):
    ref = rng.standard_normal((64, 2)).astype(np.float32)
    q = ref[:4]
    valid = np.ones(64, bool)
    valid[:4] = False  # exclude the queries themselves
    d, i = oknn.knn(jnp.asarray(q), jnp.asarray(ref), 1,
                    ref_valid=jnp.asarray(valid))
    assert (np.asarray(i)[:, 0] >= 4).all()


# ------------------------------ image -------------------------------------

def test_scharr_detects_step_edge():
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 255.0
    e = np.asarray(oimg.scharr_edges(jnp.asarray(img)))
    assert e[16, 16] > 100
    assert e[16, 4] == 0


def test_dilate_square():
    m = np.zeros((16, 16), np.float32)
    m[8, 8] = 1.0
    d = np.asarray(oimg.dilate(jnp.asarray(m), 3))
    assert d[7:10, 7:10].min() == 1.0
    assert d.sum() == 9.0


def test_inner_edge_mask():
    m = np.zeros((16, 16), bool)
    m[4:12, 4:12] = True
    e = np.asarray(oimg.inner_edge_mask(jnp.asarray(m)))
    assert e[4, 4] and e[4, 8] and e[11, 11]
    assert not e[8, 8]
    assert not e[0, 0]


def test_nearest_fill_exact_vs_scipy(rng):
    from scipy.interpolate import griddata

    h = w = 48
    valid = rng.random((h, w)) < 0.05
    valid[0, 0] = True
    vals = rng.random((h, w, 3)).astype(np.float32)
    out, src = oimg.nearest_fill(jnp.asarray(vals), jnp.asarray(valid),
                                 return_sources=True)
    out, src = np.asarray(out), np.asarray(src)
    # scipy reference distances
    yy, xx = np.mgrid[0:h, 0:w]
    pts = np.stack([yy[valid], xx[valid]], 1)
    ref = griddata(pts, vals[valid], (yy, xx), method="nearest")
    from scipy.spatial import cKDTree

    d_exact, _ = cKDTree(pts).query(np.stack([yy.ravel(), xx.ravel()], 1))
    d_mine = np.sqrt(((np.stack([yy, xx], -1) - src) ** 2).sum(-1)).ravel()
    # tie-agnostic: our chosen source must be (near-)optimal in distance
    assert (d_mine <= d_exact + 1e-4).mean() > 0.999
    # values agree except at genuine distance ties (integer pixel grids
    # tie often; scipy breaks ties by point order, JFA by propagation order)
    mismatch = (np.abs(out - ref).max(-1) > 1e-5).mean()
    assert mismatch < 0.08


def test_pullpush_fill_interpolates():
    h = w = 32
    vals = np.zeros((h, w, 1), np.float32)
    valid = np.zeros((h, w), bool)
    vals[0, :, 0] = 0.0
    vals[-1, :, 0] = 1.0
    valid[0, :] = True
    valid[-1, :] = True
    out = np.asarray(oimg.pullpush_fill(jnp.asarray(vals), jnp.asarray(valid)))
    assert np.isfinite(out).all()
    # mid rows should be between the boundary values and increase downward
    assert 0.2 < out[h // 2, w // 2, 0] < 0.8
    assert out[h // 4, w // 2, 0] < out[3 * h // 4, w // 2, 0]


def test_rescale_about_center():
    img = np.zeros((1, 32, 32), np.float32)
    img[0, 8:24, 8:24] = 1.0
    out = np.asarray(oimg.rescale_about_center(jnp.asarray(img),
                                               jnp.asarray(0.5)))
    # shrunk square occupies ~ quarter the area, still centered
    assert out[0, 16, 16] == 1.0
    assert abs(out.sum() - 16 * 16 * 0.25) < 40
    assert out[0, 9, 9] == 0.0


# ------------------------------ raster ------------------------------------

def test_rasterize_single_triangle():
    verts = jnp.asarray([[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]])
    depth = jnp.asarray([1.0, 1.0, 1.0])
    faces = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    out = orast.rasterize(verts, depth, faces, res=64, chunk=8)
    fid = np.asarray(out.face_id)
    assert (fid == 0).sum() > 200          # covered area
    assert fid[2, 2] == -1                  # corner is background
    # triangle apex at ndc y=+0.5 -> extends into bottom half (rows > 32)
    assert (fid[40] == 0).any()
    assert (fid[50] == 0).sum() == 0  # below the apex row: background
    cov = np.asarray(out.zbuf)[fid == 0]
    np.testing.assert_allclose(cov, 1.0, atol=1e-5)
    b = np.asarray(out.bary)[fid == 0]
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-4)


def test_rasterize_depth_order():
    # two overlapping triangles; nearer one must win
    verts = jnp.asarray([
        [-0.8, -0.8], [0.8, -0.8], [0.0, 0.8],     # far tri
        [-0.8, -0.8], [0.8, -0.8], [0.0, 0.8],     # near tri (same shape)
    ])
    depth = jnp.asarray([2.0, 2.0, 2.0, 1.0, 1.0, 1.0])
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], dtype=jnp.int32)
    out = orast.rasterize(verts, depth, faces, res=32, chunk=1)
    fid = np.asarray(out.face_id)
    assert (fid == 1).sum() > 0
    assert (fid == 0).sum() == 0  # far tri fully occluded


def test_interpolate_attributes():
    verts = jnp.asarray([[-1.0, -1.0], [1.0, -1.0], [0.0, 1.0]])
    depth = jnp.ones(3)
    faces = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    out = orast.rasterize(verts, depth, faces, res=32, chunk=1)
    attr = jnp.asarray([[0.0], [1.0], [0.5]])
    vals = np.asarray(orast.interpolate(attr, faces, out.face_id, out.bary))
    fid = np.asarray(out.face_id)
    inside = vals[fid == 0, 0]
    assert inside.min() >= -1e-4 and inside.max() <= 1.0 + 1e-4


def test_face_normals():
    v = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]])
    f = jnp.asarray([[0, 1, 2]])
    n = np.asarray(orast.face_normals(v, f))
    np.testing.assert_allclose(n, [[0, 0, 1]], atol=1e-6)


# ----------------------------- iso-surface --------------------------------

def test_marching_tets_sphere():
    res = 33
    axis = np.linspace(-0.6, 0.6, res, dtype=np.float32)
    g = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.4
    verts, faces = oiso.marching_tets(sdf.astype(np.float32), axis)
    assert len(verts) > 200 and len(faces) > 400
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r, 0.4, atol=0.05)
    # closed orientable surface: every edge shared by exactly 2 faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    ekey = np.sort(edges, 1)
    _, counts = np.unique(ekey, axis=0, return_counts=True)
    assert (counts == 2).all()
    # outward winding: normals point away from center
    fn = np.asarray(orast.face_normals(jnp.asarray(verts),
                                       jnp.asarray(faces)))
    centers = verts[faces].mean(1)
    outward = (fn * centers).sum(-1)
    assert (outward > 0).mean() > 0.99


# ------------------------------- sdf --------------------------------------

def _sphere_cloud(n=2000, r=0.4, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32), v.astype(np.float32)


def test_normal_estimation_sphere():
    pts, true_n = _sphere_cloud()
    est = osdf.estimate_oriented_normals(pts, k_pca=12, k_mst=8)
    cos = np.abs((est * true_n).sum(-1))
    assert np.median(cos) > 0.98
    # orientation must be consistently OUTWARD, not merely consistent —
    # the round-4 single-seed sign left the demo clock globally INVERTED
    # (the 6-axis extreme-point majority in orient_normals_mst fixes it)
    sgn = np.sign((est * true_n).sum(-1))
    assert sgn.mean() > 0.95


def test_normal_orientation_global_vote_box():
    """An elongated box cloud: every axis-extreme face votes; the global
    sign must come out outward even though the topmost point sits on an
    edge-adjacent face where a single-seed heuristic is fragile."""
    rng = np.random.default_rng(3)
    n = 3000
    face = rng.integers(0, 6, n)
    uv = rng.random((n, 2)) - 0.5
    ext = np.array([0.2, 0.5, 0.3])
    pts = np.zeros((n, 3), np.float32)
    true_n = np.zeros((n, 3), np.float32)
    for i in range(n):
        a = face[i] % 3
        s = 1.0 if face[i] < 3 else -1.0
        o = [j for j in range(3) if j != a]
        pts[i, a] = s * ext[a]
        pts[i, o[0]] = uv[i, 0] * 2 * ext[o[0]]
        pts[i, o[1]] = uv[i, 1] * 2 * ext[o[1]]
        true_n[i, a] = s
    est = osdf.estimate_oriented_normals(pts)
    sgn = np.sign((est * true_n).sum(-1))
    assert sgn.mean() > 0.9, sgn.mean()


def test_visibility_refine_fixes_flipped_patch():
    """refine_orientation_by_visibility: flip a contiguous 20% cap of a
    sphere's normals; HPR sees every point of a sphere, so the vote +
    kNN smoothing must restore outward orientation nearly everywhere."""
    pts, true_n = _sphere_cloud(n=3000, seed=4)
    bad = pts[:, 2] > 0.25                       # a polar cap
    nrm = np.where(bad[:, None], -true_n, true_n).astype(np.float32)
    fixed = osdf.refine_orientation_by_visibility(pts, nrm)
    sgn = np.sign((fixed * true_n).sum(-1))
    assert sgn.mean() > 0.97, sgn.mean()
    # and it must not damage an already-correct orientation
    kept = osdf.refine_orientation_by_visibility(pts, true_n)
    assert np.sign((kept * true_n).sum(-1)).mean() > 0.97


def test_hoppe_sdf_sphere():
    pts, true_n = _sphere_cloud()
    f_in = np.asarray(osdf.hoppe_sdf(jnp.zeros((1, 3)), jnp.asarray(pts),
                                     jnp.asarray(true_n)))
    f_out = np.asarray(osdf.hoppe_sdf(jnp.asarray([[0.55, 0, 0]]),
                                      jnp.asarray(pts), jnp.asarray(true_n)))
    assert f_in[0] < -0.2 and f_out[0] > 0.05


def test_poisson_fft_sphere():
    pts, true_n = _sphere_cloud(4000)
    pts01 = pts / 1.2 + 0.5
    chi = np.asarray(osdf.poisson_indicator_grid(
        jnp.asarray(pts01), jnp.asarray(true_n), res=64))
    assert chi[32, 32, 32] < 0          # center inside
    assert chi[2, 2, 2] > 0             # corner outside


def test_poisson_screening_pins_iso_level():
    """Nonuniform sampling drifts the unscreened indicator's level; the
    screening term (Kazhdan & Hoppe 2013 / pymeshlab SPR,
    baselines/spr.py:60-65) pins chi ~ 0 at the surface."""
    rng = np.random.default_rng(3)
    v = rng.standard_normal((6000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # 10:1 density imbalance between hemispheres
    keep = (v[:, 2] > 0) | (rng.random(len(v)) < 0.1)
    v = v[keep]
    pts01 = (v * 0.4) / 1.2 + 0.5

    # uniform held-out test points on the true surface
    t = rng.standard_normal((2000, 3))
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    q01 = (t * 0.4) / 1.2 + 0.5

    def surf_err(chi):
        # |chi| at the true surface, normalized by the inside-outside swing
        g = np.clip((q01 * 63).round().astype(int), 0, 63)
        swing = chi[2, 2, 2] - chi[32, 32, 32]
        return np.abs(chi[g[:, 0], g[:, 1], g[:, 2]]).mean() / swing

    base = np.asarray(osdf.poisson_indicator_grid(
        jnp.asarray(pts01, jnp.float32), jnp.asarray(v, jnp.float32),
        res=64, screen_weight=0.0))
    scr = np.asarray(osdf.poisson_indicator_grid(
        jnp.asarray(pts01, jnp.float32), jnp.asarray(v, jnp.float32),
        res=64, screen_weight=4.0, screen_iters=16))
    assert np.isfinite(scr).all()
    assert scr[32, 32, 32] < 0 and scr[2, 2, 2] > 0
    e0, e1 = surf_err(base), surf_err(scr)
    assert e1 < e0, f"screening did not reduce surface error: {e1} vs {e0}"


# ------------------------------- splat ------------------------------------

def test_paint_pixels_and_visibility():
    img = jnp.zeros((16, 16, 3))
    pix = jnp.asarray([[2, 3], [10, 10]])
    col = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    out = np.asarray(osplat.paint_pixels(img, pix, col, point_size=1))
    np.testing.assert_allclose(out[2, 3], [1, 0, 0])
    np.testing.assert_allclose(out[10, 10], [0, 1, 0])
    # valid mask drops a point
    out = np.asarray(osplat.paint_pixels(img, pix, col, 1,
                                         valid=jnp.asarray([True, False])))
    assert out[10, 10].sum() == 0

    # depth visibility: a point behind the z-buffer surface is invisible
    mesh_depth = jnp.full((1, 8, 8), 1.0)
    ndc = jnp.zeros((1, 2, 2))
    depth = jnp.asarray([[0.99, 1.5]])
    vis = np.asarray(osplat.point_visibility_by_depth(
        ndc, depth, mesh_depth, offset=0.05))
    assert vis[0, 0] and not vis[0, 1]


def test_hidden_point_removal_sphere():
    pts, _ = _sphere_cloud(1500)
    eyes = np.array([[0, 0, -1.6]])
    vis = osplat.hidden_point_removal_visibility(pts, eyes, 100.0)
    front = pts[:, 2] < -0.2
    back = pts[:, 2] > 0.2
    assert vis[0, front].mean() > 0.7
    assert vis[0, back].mean() < 0.1


def test_native_hull_matches_scipy():
    """The C++ quickhull (native/hull) must reproduce scipy/qhull's HPR
    visibility exactly — same algorithm, double precision, hull-vertex
    set only.  Reference: o3d hidden_point_removal (ours_utils.py:204)."""
    import pointdreamer_tpu.native.hull as nhull

    rng = np.random.default_rng(3)
    n = 4000
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = 1.0 + 0.3 * np.sin(5 * u[:, 0]) * np.cos(4 * u[:, 1])
    pts = (u * r[:, None]).astype(np.float64)
    eyes = np.array([[2.5, 0, 0], [0, -2.5, 0.5], [1.5, 1.5, 1.5]])

    vis_c, rc = nhull.hpr_visibility(pts, eyes, 100.0)
    assert (rc == 0).all()

    os.environ["PD_NO_NATIVE_HULL"] = "1"
    try:
        vis_s = osplat.hidden_point_removal_visibility(pts, eyes, 100.0)
    finally:
        del os.environ["PD_NO_NATIVE_HULL"]
    agree = (vis_c == vis_s).mean(axis=1)
    # identical up to eps-ties on facet-coplanar points (none expected
    # on generic inputs, but allow a hair of slack)
    assert (agree >= 0.999).all(), agree
    # and the dispatcher (fast path) agrees with the scipy path too
    vis_d = osplat.hidden_point_removal_visibility(pts, eyes, 100.0)
    assert (vis_d == vis_c).all()


def test_pullpush_close_to_scipy_linear(rng):
    """'linear' inpainting quality bound: on a smooth field sampled at
    scattered pixels, pull-push (ours) must reconstruct the field with
    error comparable to scipy griddata(method='linear') — the reference's
    naive_inpainting path (ours_utils.py:639).  Pull-push is not Delaunay
    interpolation, so the contract is quantitative closeness to the true
    field, not pixel equality with scipy."""
    from scipy.interpolate import griddata

    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    field = np.stack([
        np.sin(xx / 9.0) * np.cos(yy / 7.0),
        (xx + yy) / (h + w),
        np.cos(xx / 5.0) * 0.5,
    ], -1).astype(np.float32)
    valid = rng.random((h, w)) < 0.10
    # pin corners so scipy's convex hull covers the frame
    valid[0, 0] = valid[0, -1] = valid[-1, 0] = valid[-1, -1] = True

    vals = np.where(valid[..., None], field, 0.0).astype(np.float32)
    ours = np.asarray(oimg.pullpush_fill(jnp.asarray(vals),
                                         jnp.asarray(valid)))

    pts = np.stack([yy[valid], xx[valid]], 1)
    ref = griddata(pts, field[valid], (yy, xx), method="linear")

    hole = ~valid
    err_ours = np.sqrt(((ours - field) ** 2).mean(-1))[hole]
    err_ref = np.sqrt(((ref - field) ** 2).mean(-1))[hole]
    # absolute quality on the smooth field...
    assert err_ours.mean() < 0.05, err_ours.mean()
    # ...and within a modest factor of Delaunay-linear interpolation
    assert err_ours.mean() < 3.0 * err_ref.mean() + 1e-3, (
        err_ours.mean(), err_ref.mean())


def test_morph_close_fills_small_holes():
    """fill_hole parity (utils_2d.py:509): closing removes holes smaller
    than the kernel but preserves the outer silhouette."""
    m = np.zeros((40, 40), np.float32)
    m[8:32, 8:32] = 1.0
    m[18:21, 18:21] = 0.0          # 3x3 hole -> closed by k=7
    out = np.asarray(oimg.morph_close(jnp.asarray(m), 7))
    assert out[19, 19] == 1.0
    assert out[4, 4] == 0.0
    assert out[8:32, 8:32].min() == 1.0
    np.testing.assert_array_equal(out >= 0.5, oimg_close_ref(m, 7) >= 0.5)


def oimg_close_ref(m, k):
    from scipy import ndimage

    return ndimage.grey_closing(m, size=(k, k), mode="reflect")


def test_bilateral_filter_edge_preserving(rng):
    """Bilateral parity (utils_2d.py:757): smooths noise in flat regions
    but keeps a sharp step edge."""
    h = w = 32
    img = np.zeros((h, w, 3), np.float32)
    img[:, w // 2:] = 1.0
    noisy = img + rng.normal(0, 0.05, img.shape).astype(np.float32)
    out = np.asarray(oimg.bilateral_filter(jnp.asarray(noisy), 7))
    # noise reduced on each flat side
    assert out[:, :w // 2 - 4].std() < noisy[:, :w // 2 - 4].std() * 0.6
    # edge not smeared: means on both sides stay far apart
    assert out[:, :w // 2 - 2].mean() < 0.1
    assert out[:, w // 2 + 2:].mean() > 0.9


def test_banded_eval_matches_dense_on_sharp_field():
    """The banded grid evaluation must agree with dense evaluation at the
    iso-surface: the old nearest-sign far-field upsampling emitted
    spurious interior walls at band boundaries (junk area comparable to
    the true surface on sharp shapes)."""
    import jax.numpy as jnp

    from pointdreamer_tpu.ops import iso as oiso, sdf as osdf

    rng = np.random.default_rng(0)
    # points on a sharp cube surface
    face = rng.integers(0, 6, 6000)
    uv = rng.random((6000, 2)) - 0.5
    axis_id = face % 3
    sign = np.where(face < 3, 0.5, -0.5)
    pts = np.zeros((6000, 3), np.float32)
    rows = np.arange(6000)
    other = np.array([[1, 2], [0, 2], [0, 1]])[axis_id]
    pts[rows, axis_id] = sign
    pts[rows, other[:, 0]] = uv[:, 0]
    pts[rows, other[:, 1]] = uv[:, 1]

    def field_fn(q):
        return jnp.max(jnp.abs(q), axis=-1) - 0.5

    res = 64
    lo, hi = -0.6, 0.6
    fb = osdf.eval_sdf_on_grid_banded(field_fn, pts, res, lo, hi)
    fd = osdf.eval_sdf_on_grid(field_fn, res, lo, hi)
    ax = np.linspace(lo, hi, res, dtype=np.float32)
    vb, tb = oiso.marching_tets(fb, ax)
    vd, td = oiso.marching_tets(fd, ax)

    def area(v, f):
        fv = v[np.asarray(f)]
        return float(0.5 * np.linalg.norm(
            np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0]),
            axis=1).sum())

    ab, ad = area(vb, tb), area(vd, td)
    assert abs(ab - ad) < 0.05 * ad, (ab, ad)
    # same signs everywhere on the fine grid at the surface band
    assert (np.sign(fb) == np.sign(fd)).mean() > 0.999


def test_marching_cubes_sphere():
    # 256-case MC: correct radius, ~3x fewer triangles than tets,
    # watertight and consistently outward-wound
    R = 32
    axis = np.linspace(-0.6, 0.6, R, dtype=np.float32)
    g = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), -1)
    sdf = (np.linalg.norm(g, axis=-1) - 0.4).astype(np.float32)
    vm, fm = oiso.marching_cubes(sdf, axis)
    vt, ft = oiso.marching_tets(sdf, axis)
    assert len(fm) * 2 < len(ft)
    r = np.linalg.norm(vm, axis=1)
    assert abs(r.mean() - 0.4) < 2e-3 and np.abs(r - 0.4).max() < 2e-2
    edges = {}
    for (a, b, c) in fm:
        for u, v in ((a, b), (b, c), (c, a)):
            edges[(u, v)] = edges.get((u, v), 0) + 1
    assert all(n == 1 for n in edges.values())          # 2-manifold
    assert all((v, u) in edges for (u, v) in edges)     # watertight
    tri = vm[fm]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    assert (np.einsum("ij,ij->i", n, tri.mean(1)) > 0).all()  # outward


def test_mc_table_certified_watertight(rng):
    # the generated 256-case table must weld crack-free and 2-manifold on
    # random closed fields (exercises every ambiguous-face resolution)
    from scipy.ndimage import gaussian_filter

    R = 20
    axis = np.linspace(-0.6, 0.6, R, dtype=np.float32)
    for _ in range(3):
        f = gaussian_filter(rng.standard_normal((R, R, R)), 2.0)
        f[[0, -1], :, :] = 1.0
        f[:, [0, -1], :] = 1.0
        f[:, :, [0, -1]] = 1.0
        v, faces = oiso.marching_cubes(f.astype(np.float32), axis)
        edges = {}
        for (a, b, c) in faces:
            for u, w in ((a, b), (b, c), (c, a)):
                edges[(u, w)] = edges.get((u, w), 0) + 1
        assert all(n == 1 for n in edges.values())
        assert all((w, u) in edges for (u, w) in edges)
