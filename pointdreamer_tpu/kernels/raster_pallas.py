"""Pallas TPU rasterization kernels.

Two generations live here:

  rasterize_binned_pallas (DEFAULT on TPU, used by ops.raster.rasterize_views)
      Hybrid XLA+Pallas two-level rasterizer.  XLA does the cheap parts —
      sort-based face->tile binning (ops.raster._bin_faces_sorted) and a
      gather of per-candidate *affine barycentric coefficients* — and the
      Mosaic kernel does the hot part: for every (8, 128) VPU-shaped pixel
      block, a fori_loop over that tile's K candidates evaluating
      l_i = A_i x + B_i y + C_i (two FMAs each) and maintaining the
      z-buffer winner entirely in registers/VMEM.  No [T, K, t, t] HBM
      temporaries exist at all — the XLA scan version materializes ~10
      such arrays per chunk and is memory-bound (0.85 s for 8x512^2 views
      on v5e; this kernel ~0.1 s).

  rasterize_pallas (legacy, opt-in via PD_USE_PALLAS_RASTER=1)
      The round-1 kernel: streams the FULL face list per tile with a bbox
      @pl.when predicate.  Correct but slower than the XLA path for small
      scattered triangles; kept for A/B testing.

Replaces nvdiffrast (CUDA) call sites listed in ops/raster.py.
Interpret mode makes the same kernels exact on CPU for tests.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.raster import RasterOut

TILE_R = 8
TILE_C = 128


# ===========================================================================
# Binned kernel (current generation)
# ===========================================================================

_SUB = 8                # candidates per inner step (one sublane tile)


def _binned_kernel(cof_ref, zbuf_ref, fid_ref, bary_ref):
    """One (8,128) pixel block; loop over the tile's K candidates.

    cof_ref  [1, 1, K, 16] f32 — K on SUBLANES (K % 8 == 0): Mosaic
             forbids dynamic scalar indexing along the 128-lane dim, so
             the inner loop loads an 8-candidate sub-block at the
             provably-aligned offset `pl.ds(jb*8, 8)` and extracts the 13
             coefficients of each candidate with STATIC indices from the
             unrolled python loop.  Columns: 12 affine coefficients (see
             _face_coefficients) + the global face id as an exact float
             (-1 for empty slots) + 3 pad.
    zbuf_ref [1, 8, 128]   f32
    fid_ref  [1, 8, 128]   i32
    bary_ref [1, 4, 8, 128] f32 — l0, l1, l2 planes (+1 pad row)
    """
    tj = pl.program_id(2)
    ti = pl.program_id(1)
    row0 = (ti * TILE_R)
    col0 = (tj * TILE_C)
    rows = (jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
            + row0).astype(jnp.float32) + 0.5
    cols = (jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
            + col0).astype(jnp.float32) + 0.5

    K = cof_ref.shape[2]
    big = jnp.float32(3.0e38)

    def body(jb, carry):
        blk = cof_ref[0, 0, pl.ds(jb * _SUB, _SUB), :]   # [8, 16]
        for i in range(_SUB):
            z, fid, l0b, l1b, l2b = carry
            l0 = blk[i, 0] * cols + blk[i, 1] * rows + blk[i, 2]
            l1 = blk[i, 3] * cols + blk[i, 4] * rows + blk[i, 5]
            l2 = blk[i, 6] * cols + blk[i, 7] * rows + blk[i, 8]
            zk = blk[i, 9] * cols + blk[i, 10] * rows + blk[i, 11]
            cid = blk[i, 12].astype(jnp.int32)
            inside = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & (zk > 0.0)
            zc = jnp.where(inside, zk, big)
            win = zc < z
            carry = (jnp.where(win, zc, z),
                     jnp.where(win, cid, fid),
                     jnp.where(win, l0, l0b),
                     jnp.where(win, l1, l1b),
                     jnp.where(win, l2, l2b))
        return carry

    init = (jnp.full((TILE_R, TILE_C), big, jnp.float32),
            jnp.full((TILE_R, TILE_C), -1, jnp.int32),
            jnp.zeros((TILE_R, TILE_C), jnp.float32),
            jnp.zeros((TILE_R, TILE_C), jnp.float32),
            jnp.zeros((TILE_R, TILE_C), jnp.float32))
    z, fid, l0, l1, l2 = jax.lax.fori_loop(0, K // _SUB, body, init)

    zbuf_ref[0] = jnp.where(fid >= 0, z, jnp.inf)
    fid_ref[0] = fid
    bary_ref[0, 0] = l0
    bary_ref[0, 1] = l1
    bary_ref[0, 2] = l2
    bary_ref[0, 3] = jnp.zeros((TILE_R, TILE_C), jnp.float32)


def _face_coefficients(tri_xy: jnp.ndarray, tri_z: jnp.ndarray):
    """Affine plane coefficients per face: barycentrics l_i(x, y) =
    A_i x + B_i y + C_i and the z plane.  Degenerate faces get C=-1 rows
    so they never pass the l>=0 test.  Returns [F, 12] f32."""
    ax, ay = tri_xy[:, 0, 0], tri_xy[:, 0, 1]
    bx, by = tri_xy[:, 1, 0], tri_xy[:, 1, 1]
    cx, cy = tri_xy[:, 2, 0], tri_xy[:, 2, 1]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    ok = jnp.abs(area) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, area, 1.0), 0.0)

    # l0 from edge(b->c): ((cx-bx)(y-by) - (cy-by)(x-bx)) * inv
    def coef(x0, y0, x1, y1):
        A = -(y1 - y0) * inv
        B = (x1 - x0) * inv
        C = ((y1 - y0) * x0 - (x1 - x0) * y0) * inv
        return A, B, C

    A0, B0, C0 = coef(bx, by, cx, cy)
    A1, B1, C1 = coef(cx, cy, ax, ay)
    A2, B2, C2 = coef(ax, ay, bx, by)
    z0, z1, z2 = tri_z[:, 0], tri_z[:, 1], tri_z[:, 2]
    Az = A0 * z0 + A1 * z1 + A2 * z2
    Bz = B0 * z0 + B1 * z1 + B2 * z2
    Cz = C0 * z0 + C1 * z1 + C2 * z2
    cof = jnp.stack([A0, B0, C0, A1, B1, C1, A2, B2, C2, Az, Bz, Cz], 1)
    bad = jnp.stack([jnp.zeros_like(A0)] * 2 + [-jnp.ones_like(A0)]
                    + [jnp.zeros_like(A0)] * 9, 1)
    return jnp.where(ok[:, None], cof, bad)


@functools.partial(jax.jit,
                   static_argnames=("res", "cull_backface", "interpret",
                                    "side_list"))
def rasterize_views_binned_pallas(
    verts_ndc: jnp.ndarray,    # [V, N, 2]
    verts_depth: jnp.ndarray,  # [V, N]
    faces: jnp.ndarray,        # [F, 3] int32
    res: int,
    cull_backface: bool = False,
    interpret: bool = False,
    side_list: int = 64,
) -> RasterOut:
    """All-views rasterization: XLA binning + coefficient gather, Pallas
    per-tile z-buffer loop.  res must be a multiple of 128.  `side_list`
    sizes the big-face global list (callers with concrete inputs size it
    from the layout — ops.raster._side_list_budget)."""
    assert res % TILE_C == 0
    V = verts_ndc.shape[0]
    F = faces.shape[0]
    nth, ntw = res // TILE_R, res // TILE_C
    K = min(F, max(128, (16 * F) // (nth * ntw)))

    def per_view(ndc, depth):
        px = (ndc * 0.5 + 0.5) * res
        tri_xy = px[faces]
        tri_z = depth[faces]
        if cull_backface:
            e1 = tri_xy[:, 1] - tri_xy[:, 0]
            e2 = tri_xy[:, 2] - tri_xy[:, 0]
            signed = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
            tri_xy = jnp.where((signed < 0.0)[:, None, None], tri_xy, -1e6)
        cid = _bin_faces_sorted_rect(tri_xy, res, K,
                                     B=side_list)         # [T, KB]
        cof = _face_coefficients(tri_xy, tri_z)           # [F, 12]
        # column 12: candidate face id as exact float (F < 2^24)
        cof = jnp.concatenate(
            [cof, jnp.arange(cof.shape[0], dtype=jnp.float32)[:, None]], 1)
        safe = jnp.maximum(cid, 0)
        bad = jnp.asarray([0, 0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1],
                          jnp.float32)
        cof_t = jnp.where((cid >= 0)[:, :, None],
                          cof[safe], bad[None, None, :])  # [T, KB, 13]
        # pad: columns 13 -> 16; candidate count up to a sublane multiple
        # (the kernel consumes 8-candidate sub-blocks)
        pad_k = (-cof_t.shape[1]) % _SUB
        cof_t = jnp.pad(cof_t, ((0, 0), (0, pad_k), (0, 3)),
                        constant_values=0.0)
        if pad_k:
            # padded slots must read as empty (C0 = -1, id = -1)
            fill = jnp.broadcast_to(
                jnp.pad(bad, (0, 3))[None, None, :],
                (cof_t.shape[0], pad_k, 16))
            cof_t = cof_t.at[:, -pad_k:, :].set(fill)
        return cof_t

    cof = jax.vmap(per_view)(verts_ndc, verts_depth)
    KB = cof.shape[2]                     # K + side list, 8-aligned

    T = nth * ntw
    grid = (V, nth, ntw)
    zbuf, fid, bary4 = pl.pallas_call(
        _binned_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, KB, 16),
                         lambda v, i, j: (v, i * ntw + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_R, TILE_C),
                         lambda v, i, j: (v, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R, TILE_C),
                         lambda v, i, j: (v, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, TILE_R, TILE_C),
                         lambda v, i, j: (v, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, res, res), jnp.float32),
            jax.ShapeDtypeStruct((V, res, res), jnp.int32),
            jax.ShapeDtypeStruct((V, 4, res, res), jnp.float32),
        ],
        interpret=interpret,
    )(cof)

    bary = jnp.moveaxis(bary4[:, :3], 1, -1)              # [V,res,res,3]
    return RasterOut(face_id=fid, zbuf=zbuf, bary=bary)


def _bin_faces_sorted_rect(tri_xy, res: int, K: int, B: int = 64):
    """bin_faces_grid for the (TILE_R x TILE_C) rectangular tiles the
    Pallas kernel uses.  Footprint: 3 column tiles (384 px wide) x
    res/(8*TILE_R) row tiles (res/8 px tall) — sized so the largest faces
    of decimated meshes and LSCM atlas charts emit pairs instead of
    overflowing the B-slot side list."""
    from ..ops.raster import bin_faces_grid

    nth, ntw = res // TILE_R, res // TILE_C
    span_y = max(8, res // (8 * TILE_R))
    return bin_faces_grid(tri_xy, TILE_C, TILE_R, ntw, nth, K, B=B,
                          span_x=3, span_y=span_y)


# ===========================================================================
# Legacy full-stream kernel (round 1, opt-in)
# ===========================================================================

def _kernel(txy_ref, tz_ref, bbox_ref, zbuf_ref, fid_ref, bary_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    row0 = (ti * TILE_R).astype(jnp.float32)
    col0 = (tj * TILE_C).astype(jnp.float32)

    # Mosaic iota must be integer-typed; cast to f32 afterwards
    rows = (jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
            .astype(jnp.float32) + row0 + 0.5)
    cols = (jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
            .astype(jnp.float32) + col0 + 0.5)

    zbuf_ref[:] = jnp.full((TILE_R, TILE_C), jnp.inf, jnp.float32)
    fid_ref[:] = jnp.full((TILE_R, TILE_C), -1, jnp.int32)
    bary_ref[:] = jnp.zeros((TILE_R, TILE_C, 3), jnp.float32)

    n_faces = txy_ref.shape[0]
    row1 = row0 + TILE_R
    col1 = col0 + TILE_C

    def body(f, _):
        fx0 = bbox_ref[f, 0]
        fy0 = bbox_ref[f, 1]
        fx1 = bbox_ref[f, 2]
        fy1 = bbox_ref[f, 3]
        overlaps = ((fx1 >= col0) & (fx0 < col1)
                    & (fy1 >= row0) & (fy0 < row1))

        @pl.when(overlaps)
        def _():
            ax = txy_ref[f, 0, 0]
            ay = txy_ref[f, 0, 1]
            bx = txy_ref[f, 1, 0]
            by = txy_ref[f, 1, 1]
            cx = txy_ref[f, 2, 0]
            cy = txy_ref[f, 2, 1]
            area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
            w0 = ((cx - bx) * (rows - by) - (cy - by) * (cols - bx))
            w1 = ((ax - cx) * (rows - cy) - (ay - cy) * (cols - cx))
            w2 = ((bx - ax) * (rows - ay) - (by - ay) * (cols - ax))
            l0 = w0 * inv_area
            l1 = w1 * inv_area
            l2 = w2 * inv_area
            z = (l0 * tz_ref[f, 0] + l1 * tz_ref[f, 1] + l2 * tz_ref[f, 2])
            inside = ((l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
                      & (jnp.abs(area) > 1e-12) & (z > 0.0))
            zc = jnp.where(inside, z, jnp.inf)
            take = zc < zbuf_ref[:]
            zbuf_ref[:] = jnp.where(take, zc, zbuf_ref[:])
            fid_ref[:] = jnp.where(take, f, fid_ref[:])
            bary_ref[:] = jnp.where(
                take[..., None], jnp.stack([l0, l1, l2], -1), bary_ref[:])

        return 0

    jax.lax.fori_loop(0, n_faces, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("res", "cull_backface", "interpret"))
def rasterize_pallas(
    verts_ndc: jnp.ndarray,   # [N, 2]
    verts_depth: jnp.ndarray, # [N]
    faces: jnp.ndarray,       # [F, 3] int32
    res: int,
    cull_backface: bool = False,
    interpret: bool = False,
) -> RasterOut:
    """One view. res must be a multiple of 128."""
    assert res % TILE_C == 0 and res % TILE_R == 0
    px = (verts_ndc * 0.5 + 0.5) * res
    tri_xy = px[faces]           # [F,3,2]
    tri_z = verts_depth[faces]   # [F,3]

    if cull_backface:
        e1 = tri_xy[:, 1] - tri_xy[:, 0]
        e2 = tri_xy[:, 2] - tri_xy[:, 0]
        signed = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        front = (signed < 0.0)[:, None, None]
        tri_xy = jnp.where(front, tri_xy, -1e6)

    bbox = jnp.concatenate([tri_xy.min(1), tri_xy.max(1)], axis=1)  # [F,4]

    grid = (res // TILE_R, res // TILE_C)
    out_shape = [
        jax.ShapeDtypeStruct((res, res), jnp.float32),
        jax.ShapeDtypeStruct((res, res), jnp.int32),
        jax.ShapeDtypeStruct((res, res, 3), jnp.float32),
    ]
    zbuf, fid, bary = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # txy (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tz
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bbox
        ],
        out_specs=[
            pl.BlockSpec((TILE_R, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, TILE_C, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(tri_xy, tri_z, bbox)
    return RasterOut(face_id=fid, zbuf=zbuf, bary=bary)
