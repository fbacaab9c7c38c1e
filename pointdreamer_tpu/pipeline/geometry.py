"""Geometry reconstruction stage: colored point cloud -> triangle mesh.

Reference counterpart: POCO_get_geo (models/POCO/generate_1.py:70-290,
occupancy network + region-growing marching cubes + quadric decimation)
and the SPR baseline (baselines/spr.py:26-74, pymeshlab screened Poisson).

TPU-native backends:
  'hoppe'       — oriented-normal tangent-plane SDF (ops.sdf.hoppe_sdf)
  'SPR'/'poisson_fft' — FFT-Poisson indicator; `screen_weight` > 0 adds
                  SPR's screening term via preconditioned CG
                  (ops.sdf.poisson_indicator_grid) for nonuniform scans
  'POCO'        — the flax occupancy network (models/occupancy); requires a
                  converted checkpoint, else falls back to 'SPR'.

All evaluate a dense 128^3 field (no python region growing — dense is the
TPU-fast shape), extract via marching tetrahedra, and decimate on host.
"""
from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import iso as oiso
from ..ops import sdf as osdf

GRID_LO, GRID_HI = -0.62, 0.62


def normalize_points(xyz: np.ndarray) -> Tuple[np.ndarray, np.ndarray, float]:
    """Center to the bbox midpoint and scale the longest side to 1
    (reference demo.py:377-380).  Returns (normalized, center, scale)."""
    vmin = xyz.min(axis=0)
    vmax = xyz.max(axis=0)
    center = (vmin + vmax) / 2.0
    scale = float((vmax - vmin).max())
    return ((xyz - center) / scale).astype(np.float32), center, scale


def decimate_vertex_clustering(vertices: np.ndarray, faces: np.ndarray,
                               target_faces: int) -> Tuple[np.ndarray, np.ndarray]:
    """Grid vertex-clustering decimation (host).  Crude but robust stand-in
    for o3d simplify_quadric_decimation (generate.py:283) until the C++
    QEM library is used; native/qem provides the quality path."""
    try:
        from ..native import qem

        return qem.simplify(vertices, faces, target_faces)
    except Exception:
        pass
    if len(faces) <= target_faces:
        return vertices, faces
    lo, hi = 4, 512
    best = (vertices, faces)
    for _ in range(12):
        res = (lo + hi) // 2
        v, f = _cluster_once(vertices, faces, res)
        if len(f) > target_faces:
            hi = res
        else:
            lo = res
            best = (v, f)
        if hi - lo <= 1:
            break
    v, f = _cluster_once(vertices, faces, hi)
    if abs(len(f) - target_faces) < abs(len(best[1]) - target_faces) \
            and len(f) <= target_faces * 1.3:
        best = (v, f)
    return best


def _cluster_once(vertices, faces, res):
    vmin = vertices.min(0)
    ext = (vertices.max(0) - vmin).max() + 1e-9
    cell = np.floor((vertices - vmin) / ext * (res - 1e-4)).astype(np.int64)
    key = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    new_v = np.zeros((len(uniq), 3), np.float64)
    cnt = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
    for d in range(3):
        new_v[:, d] = np.bincount(inv, weights=vertices[:, d],
                                  minlength=len(uniq)) / cnt
    nf = inv[faces]
    good = ((nf[:, 0] != nf[:, 1]) & (nf[:, 1] != nf[:, 2])
            & (nf[:, 0] != nf[:, 2]))
    nf = nf[good]
    # drop duplicate faces
    sf = np.sort(nf, axis=1)
    _, fi = np.unique(sf, axis=0, return_index=True)
    return new_v.astype(np.float32), nf[np.sort(fi)]


def taubin_smooth(vertices: np.ndarray, faces: np.ndarray,
                  iterations: int = 5, lam: float = 0.5,
                  mu: float = -0.53) -> np.ndarray:
    """Taubin lambda/mu smoothing (reference utils/other_utils.py:693
    smooth-mesh helper; shrink-free unlike plain Laplacian)."""
    import jax.numpy as jnp
    import jax

    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]], 0)
    edges = np.concatenate([edges, edges[:, ::-1]], 0)
    src = jnp.asarray(edges[:, 0])
    dst = jnp.asarray(edges[:, 1])
    nv = len(vertices)
    deg = jnp.maximum(jax.ops.segment_sum(
        jnp.ones(len(edges)), src, num_segments=nv), 1.0)[:, None]

    v = jnp.asarray(vertices, jnp.float32)

    def step(v, factor):
        nbr_mean = jax.ops.segment_sum(v[dst], src, num_segments=nv) / deg
        return v + factor * (nbr_mean - v)

    for _ in range(iterations):
        v = step(v, lam)
        v = step(v, mu)
    return np.asarray(v)


def largest_component(vertices: np.ndarray, faces: np.ndarray):
    """Keep the largest edge-connected face component (removes spurious
    floater shells the implicit field can produce)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    nf = len(faces)
    if nf == 0:
        return vertices, faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]], axis=0)
    ekey = np.sort(edges, axis=1)
    ekey = ekey[:, 0] * (int(faces.max()) + 1) + ekey[:, 1]
    order = np.argsort(ekey, kind="stable")
    sk = ekey[order]
    fids = np.tile(np.arange(nf), 3)[order]
    same = np.nonzero(sk[1:] == sk[:-1])[0]
    rows, cols = fids[same], fids[same + 1]
    g = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(nf, nf))
    n_comp, lab = connected_components(g, directed=False)
    if n_comp <= 1:
        return vertices, faces
    keep = lab == np.bincount(lab).argmax()
    faces = faces[keep]
    used, inv = np.unique(faces.reshape(-1), return_inverse=True)
    return vertices[used], inv.reshape(-1, 3)


def reconstruct_mesh(
    xyz_normalized: np.ndarray,
    geo_from: str = "hoppe",
    grid_res: int = 128,
    target_faces: int = 10000,
    noise_stddev: Optional[float] = None,
    poco_apply=None,
    smooth_mesh: bool = False,
    refine_iters: int = 10,
    iso_method: str = "mc",
    # screened-Poisson default; core/config.py spr_screen_weight has the
    # measured sweep (sw=2 + 48 CG iters: best scan quality that keeps
    # every texture self-parity gate green)
    screen_weight: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Point cloud (normalized to [-0.5, 0.5]) -> (vertices, faces).

    `poco_apply`, if given, is a callable [M,3]->[M] occupancy-signed field
    (negative inside) from models.occupancy; used when geo_from='POCO'.
    `refine_iters`: bisection refinement of iso-vertices against the true
    field (reference generate.py:177-273); applies to the analytic
    backends (POCO/hoppe — the FFT-Poisson field only exists on the grid,
    where linear interpolation is already exact along edges).
    """
    import os as _os
    import time as _t
    _prof = _os.environ.get("PD_GEO_PROFILE") == "1"
    _t0 = _t.time()

    def _mark(label):
        # dispatch-time stamps: only the poisson branch synchronizes
        nonlocal _t0
        if _prof:
            print(f"[geoprof] {label}: {_t.time()-_t0:.3f}s")
            _t0 = _t.time()

    pts = np.asarray(xyz_normalized, np.float32)
    if noise_stddev:
        # reference adds sigma=0.005 noise to clean inputs before POCO
        # (generate_1.py:71-72) to match its training distribution; only
        # meaningful for the learned backend.
        rng = np.random.default_rng(0)
        pts = pts + rng.normal(0, noise_stddev, pts.shape).astype(np.float32)

    axis = np.linspace(GRID_LO, GRID_HI, grid_res, dtype=np.float32)

    if geo_from == "POCO" and poco_apply is None:
        # SPR (FFT-Poisson) over hoppe: the globally smoothed indicator
        # is the more robust non-learned prior on real scans (hoppe's
        # k-plane field is noisier where normal estimates wobble), and it
        # evaluates as one fused FFT instead of banded kNN queries
        warnings.warn("geo_from='POCO' but no checkpoint/network supplied; "
                      "falling back to the non-learned 'SPR' backend")
        geo_from = "SPR"

    field_fn = None          # analytic field for vertex refinement
    if geo_from == "POCO":
        # poco_apply: factory points -> field fn (latents encoded once per
        # shape; models/occupancy/network.py make_poco_field)
        field_fn = poco_apply(jnp.asarray(pts))
        field = osdf.eval_sdf_on_grid_banded(field_fn, pts, grid_res,
                                             GRID_LO, GRID_HI)
    elif geo_from in ("SPR", "poisson_fft"):
        normals = osdf.estimate_oriented_normals(pts)
        _mark("normals")
        span = GRID_HI - GRID_LO
        pts01 = (pts - GRID_LO) / span
        # stays ON DEVICE: no refine pass reads it (field_fn is None) and
        # marching_tets consumes device fields directly — the np round
        # trip cost 2x8 MB through the tunnel
        # screen_weight > 0 enables SPR's screening term — measurably
        # better on one-sided/nonuniform scans, measurably worse on
        # evenly sampled ones (see poisson_indicator_grid docstring)
        field = osdf.poisson_indicator_grid(
            jnp.asarray(pts01), jnp.asarray(normals), res=grid_res,
            screen_weight=screen_weight)
        if _prof:
            import jax as _jax
            _jax.block_until_ready(field)
        _mark("poisson_fft")
    elif geo_from == "hoppe":
        normals = osdf.estimate_oriented_normals(pts)
        pj, nj = jnp.asarray(pts), jnp.asarray(normals)
        field_fn = lambda q: osdf.hoppe_sdf(q, pj, nj)  # noqa: E731
        field = osdf.eval_sdf_on_grid_banded(field_fn, pts, grid_res,
                                             GRID_LO, GRID_HI)
    else:
        raise ValueError(f"unknown geo_from={geo_from}")

    extract = oiso.marching_cubes if iso_method == "mc" \
        else oiso.marching_tets
    verts, faces, edge_keys = extract(field, axis, return_edge_keys=True)
    _mark("iso_extract")
    if field_fn is not None and refine_iters > 0 and len(verts):
        # reference generate.py:177-273: 10-iteration occupancy bisection
        # of every iso vertex along its grid edge
        verts = oiso.refine_vertices_bisection(
            field_fn, verts, edge_keys, field, axis, refine_iters)
    if len(faces) == 0:
        if geo_from != "hoppe":
            # e.g. an untrained POCO: degenerate field -> retry with the
            # non-learned backend instead of failing the shape
            warnings.warn(f"{geo_from} produced an empty iso-surface; "
                          "retrying with 'hoppe'")
            return reconstruct_mesh(xyz_normalized, "hoppe", grid_res,
                                    target_faces, None, None, smooth_mesh,
                                    iso_method=iso_method)
        raise RuntimeError("iso-surface extraction produced no triangles")
    _mark("refine")
    verts, faces = largest_component(verts, faces)
    _mark("largest_component")
    verts, faces = decimate_vertex_clustering(verts, faces, target_faces)
    _mark("decimate")
    if smooth_mesh:  # reference cfg smooth_mesh (configs/default.yaml:61)
        verts = taubin_smooth(verts, faces)
    return verts.astype(np.float32), faces.astype(np.int64)
