"""Triangle rasterization in pure JAX (with a Pallas fast path for TPU).

Replaces nvdiffrast (CUDA) for all four reference uses:
  - multi-view mesh rasterization  (ours_utils.py:142 dr.rasterize)
  - UV-atlas baking                (models/get3d/extract_texture_map.py:35,57)
  - differentiable texture render  (ours_utils.py:1700-1705)
  - evaluation rendering           (utils/camera_utils.py:299-304)

Design: fixed-shape chunked brute force — a `lax.scan` over face chunks
holding a running (z, face_id, barycentrics) state per pixel.  Every array
has static shape, XLA fuses the whole loop body, and the same code vmaps
over views.  Depth is interpolated linearly in screen space (the reference
passes NDC-with-fake-W positions to nvdiffrast, ours_utils.py:89-92, which
is the same non-perspective-correct interpolation).

The [H, W] pixel grid follows core.camera: row 0 = top,
col = (ndc_x+1)/2*res, row = (ndc_y+1)/2*res.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RasterOut(NamedTuple):
    face_id: jnp.ndarray  # [H, W] int32, -1 = background
    zbuf: jnp.ndarray     # [H, W] float32, +inf where background
    bary: jnp.ndarray     # [H, W, 3] float32 barycentric weights


def _pad_faces(tri_xy, tri_z, chunk):
    f = tri_xy.shape[0]
    pad = (-f) % chunk
    if pad:
        # degenerate off-screen triangles never cover any pixel
        tri_xy = jnp.concatenate(
            [tri_xy, jnp.full((pad, 3, 2), -1e6, tri_xy.dtype)], axis=0)
        tri_z = jnp.concatenate(
            [tri_z, jnp.full((pad, 3), jnp.inf, tri_z.dtype)], axis=0)
    return tri_xy, tri_z, f + pad


@functools.partial(jax.jit, static_argnames=("res", "chunk"))
def rasterize(
    verts_ndc: jnp.ndarray,   # [N, 2] NDC xy in [-1, 1]
    verts_depth: jnp.ndarray, # [N] linear view depth (smaller = closer)
    faces: jnp.ndarray,       # [F, 3] int32
    res: int,
    chunk: int = 64,
) -> RasterOut:
    """Z-buffer rasterize one view. vmap over leading axes for multi-view."""
    px = (verts_ndc * 0.5 + 0.5) * res  # pixel space, (x=col, y=row)
    tri_xy = px[faces]                  # [F,3,2]
    tri_z = verts_depth[faces]          # [F,3]
    tri_xy, tri_z, fpad = _pad_faces(tri_xy, tri_z, chunk)

    cols = jax.lax.broadcasted_iota(jnp.float32, (res, res), 1) + 0.5
    rows = jax.lax.broadcasted_iota(jnp.float32, (res, res), 0) + 0.5

    n_chunks = fpad // chunk
    tri_xy = tri_xy.reshape(n_chunks, chunk, 3, 2)
    tri_z = tri_z.reshape(n_chunks, chunk, 3)
    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)

    init = (
        jnp.full((res, res), jnp.inf, jnp.float32),          # z
        jnp.full((res, res), -1, jnp.int32),                 # face id
        jnp.zeros((res, res, 3), jnp.float32),               # bary
    )

    def body(state, inp):
        zbuf, fid, bary = state
        cid, txy, tz = inp
        ax, ay = txy[:, 0, 0], txy[:, 0, 1]
        bx, by = txy[:, 1, 0], txy[:, 1, 1]
        cx, cy = txy[:, 2, 0], txy[:, 2, 1]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)  # [C]
        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)

        def edge(x0, y0, x1, y1):
            # cross((p1-p0), (pix-p0)) for all pixels -> [C,H,W]
            return ((x1 - x0)[:, None, None] * (rows[None] - y0[:, None, None])
                    - (y1 - y0)[:, None, None] * (cols[None] - x0[:, None, None]))

        w0 = edge(bx, by, cx, cy)  # weight of vertex a
        w1 = edge(cx, cy, ax, ay)  # weight of vertex b
        w2 = edge(ax, ay, bx, by)  # weight of vertex c
        l0 = w0 * inv_area[:, None, None]
        l1 = w1 * inv_area[:, None, None]
        l2 = w2 * inv_area[:, None, None]
        inside = (
            (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
            & (jnp.abs(area) > 1e-12)[:, None, None]
        )
        z = (l0 * tz[:, 0, None, None] + l1 * tz[:, 1, None, None]
             + l2 * tz[:, 2, None, None])
        z = jnp.where(inside & (z > 0.0), z, jnp.inf)        # [C,H,W]

        best = jnp.argmin(z, axis=0)                          # [H,W]
        best_z = jnp.take_along_axis(z, best[None], axis=0)[0]
        take = best_z < zbuf
        gf = cid * chunk + best
        new_fid = jnp.where(take, gf, fid)
        new_z = jnp.where(take, best_z, zbuf)

        def pick(l):
            return jnp.take_along_axis(l, best[None], axis=0)[0]

        new_bary = jnp.where(
            take[..., None],
            jnp.stack([pick(l0), pick(l1), pick(l2)], axis=-1),
            bary,
        )
        return (new_z, new_fid, new_bary), None

    (zbuf, fid, bary), _ = jax.lax.scan(
        body, init, (chunk_ids, tri_xy, tri_z))
    # mask out padded faces (can't win: z=inf) and clamp ids
    fid = jnp.where(fid >= faces.shape[0], -1, fid)
    return RasterOut(face_id=fid, zbuf=zbuf, bary=bary)


def bin_faces_grid(tri_xy, tile_x: int, tile_y: int, nt_x: int, nt_y: int,
                   K: int, B: int = 64, span_x: int = 4, span_y: int = 4):
    """Per-tile candidate lists WITHOUT a [T,F] top_k (which lowers to a
    full sort per tile and dominates raster cost).  Every face spanning at
    most span_x x span_y tiles emits one (tile, face) pair per covered
    tile; the pair stream is sorted by tile id and each tile gathers its K
    consecutive sorted positions — scatter-free (TPU scatters serialize;
    gathers vectorize) and only span_x*span_y*F sort keys.  Faces larger
    than the footprint go to a B-slot side list appended to EVERY tile, so
    coverage stays exact as long as there are at most B such faces
    (callers size the footprint so overflow is the rare pathological
    case).  Returns [T, K+B] int32 candidate face ids, -1 = empty slot.
    Tiles are row-major: tile_id = ty * nt_x + tx."""
    T = nt_x * nt_y
    F = tri_xy.shape[0]
    fx0 = jnp.floor(tri_xy[..., 0].min(1) / tile_x).astype(jnp.int32)
    fx1 = jnp.floor(tri_xy[..., 0].max(1) / tile_x).astype(jnp.int32)
    fy0 = jnp.floor(tri_xy[..., 1].min(1) / tile_y).astype(jnp.int32)
    fy1 = jnp.floor(tri_xy[..., 1].max(1) / tile_y).astype(jnp.int32)
    valid = ((fx1 >= 0) & (fx0 <= nt_x - 1)
             & (fy1 >= 0) & (fy0 <= nt_y - 1))
    tx0 = jnp.clip(fx0, 0, nt_x - 1)
    tx1 = jnp.clip(fx1, 0, nt_x - 1)
    ty0 = jnp.clip(fy0, 0, nt_y - 1)
    ty1 = jnp.clip(fy1, 0, nt_y - 1)
    small = valid & (tx1 - tx0 <= span_x - 1) & (ty1 - ty0 <= span_y - 1)

    cx = tx0[:, None] + jnp.arange(span_x, dtype=jnp.int32)[None]  # [F,Sx]
    cy = ty0[:, None] + jnp.arange(span_y, dtype=jnp.int32)[None]  # [F,Sy]
    okx = cx <= tx1[:, None]
    oky = cy <= ty1[:, None]
    tidg = cy[:, :, None] * nt_x + cx[:, None, :]                  # [F,Sy,Sx]
    ok = small[:, None, None] & oky[:, :, None] & okx[:, None, :]
    E = span_x * span_y
    tid = jnp.where(ok, tidg, T).reshape(-1)         # [E*F], >=T = drop
    fid = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[:, None, None],
        (F, span_y, span_x)).reshape(-1)

    order = jnp.argsort(tid, stable=True)            # E*F keys only
    stid = tid[order]
    sfid = fid[order]
    bounds = jnp.searchsorted(stid, jnp.arange(T + 1, dtype=jnp.int32))
    pos = bounds[:T, None] + jnp.arange(K, dtype=jnp.int32)[None]  # [T,K]
    ok_pos = pos < bounds[1:, None]
    cand = jnp.where(ok_pos, sfid[jnp.minimum(pos, E * F - 1)], -1)

    if B > 0:
        (big_idx,) = jnp.nonzero(valid & ~small, size=B, fill_value=-1)
        cand = jnp.concatenate(
            [cand, jnp.broadcast_to(big_idx.astype(jnp.int32)[None], (T, B))],
            axis=1)
    return cand


def _footprint_span(res: int, tile: int) -> int:
    """Footprint (in tiles) for square-tile binning: big enough that faces
    up to ~res/8 px — the largest seen on decimated meshes and LSCM atlas
    charts (measured max span 4 tiles of 16 at 512^2) — emit pairs rather
    than overflow the side list; spans scale linearly with resolution."""
    return int(np.clip(res // (tile * 8), 4, 8))


@functools.partial(jax.jit, static_argnames=("res", "tile",
                                              "max_faces_per_tile",
                                              "cull_backface",
                                              "side_list"))
def rasterize_tiled(
    verts_ndc: jnp.ndarray,
    verts_depth: jnp.ndarray,
    faces: jnp.ndarray,
    res: int,
    tile: int = 16,
    max_faces_per_tile: int = None,
    cull_backface: bool = False,
    side_list: int = 64,
) -> RasterOut:
    """Two-level rasterizer: bin faces to pixel tiles by bounding box
    (sort-based binning, `bin_faces_grid`), then test only each tile's
    candidate faces — O(tiles * K * tile^2) instead of O(res^2 * F).
    Candidates beyond `max_faces_per_tile` per tile are dropped (never
    observed for decimated meshes that fill the frame; raise K for
    pathological inputs).  max_faces_per_tile=None sizes the budget at
    8x the mean bbox-tile incidence.
    """
    assert res % tile == 0
    nt = res // tile                       # tiles per side
    F = faces.shape[0]
    if max_faces_per_tile is None:
        max_faces_per_tile = max(96, (8 * F) // (nt * nt))
    K = min(max_faces_per_tile, F)

    px = (verts_ndc * 0.5 + 0.5) * res
    tri_xy = px[faces]                     # [F,3,2] (x=col, y=row)
    tri_z = verts_depth[faces]             # [F,3]

    if cull_backface:
        # screen-space winding: with row 0 = top (y down) a front-facing
        # (outward-normal) triangle of a closed mesh has NEGATIVE signed
        # area; cull the rest by voiding their bboxes.  Safe only for
        # closed meshes (the geometry stage always produces them).
        e1 = tri_xy[:, 1] - tri_xy[:, 0]
        e2 = tri_xy[:, 2] - tri_xy[:, 0]
        signed = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        front = (signed < 0.0)[:, None, None]
        tri_xy = jnp.where(front, tri_xy, -1e6)

    span = _footprint_span(res, tile)
    cid = bin_faces_grid(tri_xy, tile, tile, nt, nt, K, B=side_list,
                         span_x=span, span_y=span)       # [T,K+B]
    cand = jnp.maximum(cid, 0)
    ctri = tri_xy[cand]                              # [T,K+B,3,2]
    cz = tri_z[cand]                                 # [T,K+B,3]

    # local pixel grid per tile
    trow = (jnp.arange(nt * nt, dtype=jnp.int32) // nt) * tile
    tcol = (jnp.arange(nt * nt, dtype=jnp.int32) % nt) * tile
    ly = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 0) + 0.5
    lx = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 1) + 0.5

    # scan over candidate chunks (bounds HBM temps to [T, CC, tile, tile])
    KB = cid.shape[1]                     # K + big-face side list
    CC = min(64, KB)
    n_cc = -(-KB // CC)
    pad_k = n_cc * CC - KB
    if pad_k:
        ctri = jnp.concatenate(
            [ctri, jnp.full((ctri.shape[0], pad_k, 3, 2), -1e6)], axis=1)
        cz = jnp.concatenate(
            [cz, jnp.full((cz.shape[0], pad_k, 3), jnp.inf)], axis=1)
        cid = jnp.concatenate(
            [cid, jnp.full((cid.shape[0], pad_k), -1, cid.dtype)], axis=1)
    T = ctri.shape[0]
    ctri_c = ctri.reshape(T, n_cc, CC, 3, 2).swapaxes(0, 1)   # [n_cc,T,CC,3,2]
    cz_c = cz.reshape(T, n_cc, CC, 3).swapaxes(0, 1)
    cid_c = cid.reshape(T, n_cc, CC).swapaxes(0, 1)

    rows_t = ly[None] + trow[:, None, None].astype(jnp.float32)  # [T,t,t]
    cols_t = lx[None] + tcol[:, None, None].astype(jnp.float32)

    init = (
        jnp.full((T, tile, tile), jnp.inf, jnp.float32),
        jnp.full((T, tile, tile), -1, jnp.int32),
        jnp.zeros((T, tile, tile, 3), jnp.float32),
    )

    def body(state, inp):
        zbuf, fid, bary = state
        txy, tz, tcid = inp                       # [T,CC,3,2],[T,CC,3],[T,CC]
        ax, ay = txy[..., 0, 0], txy[..., 0, 1]   # [T,CC]
        bx, by = txy[..., 1, 0], txy[..., 1, 1]
        cx, cy = txy[..., 2, 0], txy[..., 2, 1]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        r = rows_t[:, None]                       # [T,1,t,t]
        c = cols_t[:, None]

        def edge(x0, y0, x1, y1):
            return ((x1 - x0)[..., None, None] * (r - y0[..., None, None])
                    - (y1 - y0)[..., None, None] * (c - x0[..., None, None]))

        l0 = edge(bx, by, cx, cy) * inv_area[..., None, None]
        l1 = edge(cx, cy, ax, ay) * inv_area[..., None, None]
        l2 = edge(ax, ay, bx, by) * inv_area[..., None, None]
        inside = ((l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
                  & (jnp.abs(area) > 1e-12)[..., None, None]
                  & (tcid >= 0)[..., None, None])
        z = (l0 * tz[..., 0, None, None] + l1 * tz[..., 1, None, None]
             + l2 * tz[..., 2, None, None])
        z = jnp.where(inside & (z > 0.0), z, jnp.inf)     # [T,CC,t,t]
        best = jnp.argmin(z, axis=1)                       # [T,t,t]
        bz = jnp.take_along_axis(z, best[:, None], 1)[:, 0]
        take = bz < zbuf
        bid = jnp.take_along_axis(tcid, best.reshape(T, -1), 1).reshape(
            T, tile, tile)
        fid = jnp.where(take, bid, fid)
        zbuf = jnp.where(take, bz, zbuf)

        def pick(l):
            return jnp.take_along_axis(l, best[:, None], 1)[:, 0]

        bary = jnp.where(take[..., None],
                         jnp.stack([pick(l0), pick(l1), pick(l2)], -1), bary)
        return (zbuf, fid, bary), None

    (z_t, fid_t, bary_t), _ = jax.lax.scan(body, init, (ctri_c, cz_c, cid_c))

    def untile(a):
        extra = a.shape[3:]
        return (a.reshape((nt, nt, tile, tile) + extra)
                .swapaxes(1, 2)
                .reshape((res, res) + extra))

    return RasterOut(face_id=untile(fid_t), zbuf=untile(z_t),
                     bary=untile(bary_t))


def _count_big_faces(verts_ndc, faces, res, tile_x, tile_y,
                     span_x, span_y) -> int:
    """Host-side count of faces whose bbox exceeds the binning footprint
    (they go to the global side list).  Only callable on CONCRETE
    arrays; cheap relative to the raster itself."""
    px = (np.asarray(verts_ndc) * 0.5 + 0.5) * res     # [V,N,2]
    tri = px[:, np.asarray(faces)]                      # [V,F,3,2]
    wx = (np.floor(tri[..., 0].max(2) / tile_x)
          - np.floor(tri[..., 0].min(2) / tile_x))
    wy = (np.floor(tri[..., 1].max(2) / tile_y)
          - np.floor(tri[..., 1].min(2) / tile_y))
    onscreen = ((tri[..., 0].max(2) >= 0) & (tri[..., 0].min(2) < res)
                & (tri[..., 1].max(2) >= 0) & (tri[..., 1].min(2) < res))
    big = onscreen & ((wx > span_x - 1) | (wy > span_y - 1))
    return int(big.sum(axis=1).max()) if big.size else 0


def _side_list_budget(verts_ndc, faces, res, tile_x, tile_y,
                      span_x, span_y) -> int:
    """64-bucketed side-list size from the concrete layout; the fixed
    64-slot default silently dropped big faces on flat-feature meshes
    (hundreds of footprint-exceeding triangles -> uncovered regions)."""
    if isinstance(verts_ndc, jax.core.Tracer):
        return 64
    nbig = _count_big_faces(verts_ndc, faces, res, tile_x, tile_y,
                            span_x, span_y)
    return max(64, -(-nbig // 64) * 64)


def rasterize_views(verts_ndc, verts_depth, faces, res, chunk=64,
                    tiled=True, max_faces_per_tile=512,
                    cull_backface=False):
    """verts_ndc [V,N,2], verts_depth [V,N] -> stacked RasterOut over views."""
    faces = faces.astype(jnp.int32)
    import os

    if (os.environ.get("PD_USE_PALLAS_RASTER") == "1" and res % 128 == 0):
        from ..kernels.raster_pallas import rasterize_pallas

        return jax.vmap(lambda nd, d: rasterize_pallas(
            nd, d, faces, res, cull_backface))(verts_ndc, verts_depth)
    if (tiled and res % 128 == 0
            and os.environ.get("PD_NO_PALLAS_RASTER") != "1"
            and jax.default_backend() != "cpu"):
        # Mosaic kernel path: XLA binning + per-tile VMEM z-buffer loop
        # (kernels/raster_pallas.rasterize_views_binned_pallas)
        from ..kernels.raster_pallas import (TILE_C, TILE_R,
                                             rasterize_views_binned_pallas)

        B = _side_list_budget(verts_ndc, faces, res, TILE_C, TILE_R,
                              3, max(8, res // (8 * TILE_R)))
        return rasterize_views_binned_pallas(verts_ndc, verts_depth, faces,
                                             res, cull_backface,
                                             side_list=B)
    if tiled and res % 16 == 0:
        span = _footprint_span(res, 16)
        B = _side_list_budget(verts_ndc, faces, res, 16, 16, span, span)
        return jax.vmap(lambda nd, d: rasterize_tiled(
            nd, d, faces, res, 16, None,
            cull_backface, side_list=B))(verts_ndc, verts_depth)
    return jax.vmap(lambda nd, d: rasterize(nd, d, faces, res, chunk))(
        verts_ndc, verts_depth)


def interpolate(
    attrs: jnp.ndarray,    # [N, D] per-vertex attributes
    faces: jnp.ndarray,    # [F, 3]
    face_id: jnp.ndarray,  # [..., H, W]
    bary: jnp.ndarray,     # [..., H, W, 3]
) -> jnp.ndarray:
    """Barycentric attribute interpolation (nvdiffrast dr.interpolate
    equivalent, extract_texture_map.py:17-18). Background (-1) gets attrs
    of face 0 — mask with (face_id >= 0) downstream."""
    fid = jnp.maximum(face_id, 0)
    tri_attr = attrs[faces[fid]]          # [..., H, W, 3, D]
    return (tri_attr * bary[..., None]).sum(axis=-2)


@functools.partial(jax.jit, static_argnames=("unit",))
def face_normals(vertices: jnp.ndarray, faces: jnp.ndarray,
                 unit: bool = True) -> jnp.ndarray:
    """Per-face normals (kaolin.ops.mesh.face_normals equivalent,
    demo.py:422)."""
    fv = vertices[faces]  # [F,3,3]
    n = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    if unit:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n
