"""Iso-surface extraction: marching tetrahedra in JAX + host welding.

Replaces skimage.measure.marching_cubes and the vendored libmcubes
(reference models/POCO/generate.py:162, models/POCO/eval/src/utils/libmcubes)
with a TPU-friendly design:

  1. device: per-cube activity mask over the dense grid (sign change),
  2. host:   nonzero -> active cell list, padded to a bucket size,
  3. device: fixed-shape kernel emits up to 6 tets x 2 triangles per active
     cube with globally-keyed edge vertices (marching tetrahedra — chosen
     over classic marching cubes because its 16-entry case table is derived
     programmatically below instead of a 256x16 lookup, and every case is
     branch-free),
  4. host:   weld vertices by edge key (np.unique) -> (V, F) arrays.

Winding is fixed on device so triangle normals point from inside
(field < 0) to outside, which the NBF unprojection relies on for its
normal/view-direction priority (reference unproject.py:305).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# cube corner id c = x + 2y + 4z
CUBE_OFFSETS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], dtype=np.int32)

# six tetrahedra around the 0-7 diagonal (consistent face diagonals
# between neighboring cubes; see derivation in repo docs)
TETS = np.array(
    [[0, 1, 3, 7], [0, 2, 3, 7], [0, 2, 6, 7],
     [0, 4, 6, 7], [0, 4, 5, 7], [0, 1, 5, 7]], dtype=np.int32)


def _build_tet_table() -> np.ndarray:
    """[16 cases, 2 tris, 3 verts, 2 corner-ids]; -1 = unused.

    Case bit c set <=> tet corner c is inside (field < 0).  Each emitted
    vertex lies on a tet edge (a, b) with sign(a) != sign(b).
    """
    table = -np.ones((16, 2, 3, 2), dtype=np.int32)
    for case in range(16):
        inside = [c for c in range(4) if case & (1 << c)]
        outside = [c for c in range(4) if c not in inside]
        if len(inside) in (0, 4):
            continue
        if len(inside) == 1 or len(inside) == 3:
            apex = inside[0] if len(inside) == 1 else outside[0]
            others = [c for c in range(4) if c != apex]
            table[case, 0] = [[apex, others[0]], [apex, others[1]],
                              [apex, others[2]]]
        else:  # 2 inside, 2 outside -> quad -> 2 triangles
            i, j = inside
            k, l = outside
            quad = [[i, k], [i, l], [j, l], [j, k]]
            table[case, 0] = [quad[0], quad[1], quad[2]]
            table[case, 1] = [quad[0], quad[2], quad[3]]
    return table


TET_TABLE = _build_tet_table()


@functools.partial(jax.jit, static_argnames=("res",))
def active_cell_mask(values: jnp.ndarray, res: int) -> jnp.ndarray:
    """[R-1]^3 bool: cube has both signs among its 8 corners."""
    v = values
    c = v[:-1, :-1, :-1]
    vmin = c
    vmax = c
    for o in CUBE_OFFSETS[1:]:
        s = v[o[0]:res - 1 + o[0], o[1]:res - 1 + o[1], o[2]:res - 1 + o[2]]
        vmin = jnp.minimum(vmin, s)
        vmax = jnp.maximum(vmax, s)
    return (vmin < 0.0) & (vmax >= 0.0)


@functools.partial(jax.jit, static_argnames=("res",))
def _emit_triangles(values, axis_coords, cells, res):
    """cells: [A] flat cube index over the (R-1)^3 cube grid (padded
    entries = -1), A a multiple of _EMIT_BUCKET.  Returns per-tri vertex
    positions [A,6,2,3,3], edge keys [A,6,2,3] int64 (sorted global
    corner-pair), and validity [A,6,2].  A lax.map over fixed-size
    buckets: the (large) emission body compiles ONCE per grid res and is
    reused for every active-cell count."""
    n_b = cells.shape[0] // _EMIT_BUCKET
    outs = jax.lax.map(
        lambda c: _emit_triangles_bucket(values, axis_coords, c, res),
        cells.reshape(n_b, _EMIT_BUCKET))
    return tuple(o.reshape((-1,) + o.shape[2:]) for o in outs)


_EMIT_BUCKET = 8192


@functools.partial(jax.jit, static_argnames=("res",))
def _emit_triangles_bucket(values, axis_coords, cells, res):
    rm1 = res - 1
    ok = cells >= 0
    c = jnp.maximum(cells, 0)
    cz = c % rm1
    cy = (c // rm1) % rm1
    cx = c // (rm1 * rm1)
    base = jnp.stack([cx, cy, cz], axis=-1)                      # [A,3]

    offs = jnp.asarray(CUBE_OFFSETS)                              # [8,3]
    corner_ijk = base[:, None, :] + offs[None, :, :]              # [A,8,3]
    # int32 corner ids (device x64 is disabled; the full edge key
    # lo*res^3+hi overflows int32 for res >= 48, so lo/hi stay separate
    # here and the int64 key is assembled on host)
    gid = ((corner_ijk[..., 0] * res + corner_ijk[..., 1]) * res
           + corner_ijk[..., 2]).astype(jnp.int32)                # [A,8]
    val = values[corner_ijk[..., 0], corner_ijk[..., 1], corner_ijk[..., 2]]
    pos = axis_coords[corner_ijk]                                 # [A,8,3]

    tets = jnp.asarray(TETS)                                      # [6,4]
    tval = val[:, tets]                                           # [A,6,4]
    tpos = pos[:, tets]                                           # [A,6,4,3]
    tgid = gid[:, tets]                                           # [A,6,4]

    inside = tval < 0.0                                           # [A,6,4]
    case = (inside[..., 0] * 1 + inside[..., 1] * 2
            + inside[..., 2] * 4 + inside[..., 3] * 8).astype(jnp.int32)

    tbl = jnp.asarray(TET_TABLE)                                  # [16,2,3,2]
    tri_corners = tbl[case]                                       # [A,6,2,3,2]
    tri_valid = (tri_corners[..., 0, 0] >= 0) & ok[:, None, None]  # [A,6,2]

    ca = jnp.maximum(tri_corners[..., 0], 0)                      # [A,6,2,3]
    cb = jnp.maximum(tri_corners[..., 1], 0)

    a_val = jnp.take_along_axis(tval[:, :, None, :], ca, axis=-1)
    b_val = jnp.take_along_axis(tval[:, :, None, :], cb, axis=-1)
    a_gid = jnp.take_along_axis(tgid[:, :, None, :], ca, axis=-1)
    b_gid = jnp.take_along_axis(tgid[:, :, None, :], cb, axis=-1)
    a_pos = jnp.take_along_axis(
        tpos[:, :, None, :, :], ca[..., None], axis=3)            # [A,6,2,3,3]
    b_pos = jnp.take_along_axis(
        tpos[:, :, None, :, :], cb[..., None], axis=3)

    t = a_val / jnp.where(jnp.abs(a_val - b_val) > 1e-12,
                          a_val - b_val, 1.0)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    vpos = a_pos + t * (b_pos - a_pos)                            # [A,6,2,3,3]

    lo = jnp.minimum(a_gid, b_gid)                                # [A,6,2,3]
    hi = jnp.maximum(a_gid, b_gid)

    # orient: normal should point inside -> outside
    e1 = vpos[..., 1, :] - vpos[..., 0, :]
    e2 = vpos[..., 2, :] - vpos[..., 0, :]
    nrm = jnp.cross(e1, e2)                                       # [A,6,2,3]
    w_in = jnp.where(inside, 1.0, 0.0)
    w_out = 1.0 - w_in
    c_in = (tpos * w_in[..., None]).sum(-2) / jnp.maximum(
        w_in.sum(-1, keepdims=True), 1.0)                         # [A,6,3]
    c_out = (tpos * w_out[..., None]).sum(-2) / jnp.maximum(
        w_out.sum(-1, keepdims=True), 1.0)
    outward = c_out - c_in                                        # [A,6,3]
    flip = (nrm * outward[:, :, None, :]).sum(-1) < 0.0           # [A,6,2]

    v1 = jnp.where(flip[..., None], vpos[..., 2, :], vpos[..., 1, :])
    v2 = jnp.where(flip[..., None], vpos[..., 1, :], vpos[..., 2, :])
    vpos = jnp.stack([vpos[..., 0, :], v1, v2], axis=-2)

    def swap_last(k):
        k1 = jnp.where(flip, k[..., 2], k[..., 1])
        k2 = jnp.where(flip, k[..., 1], k[..., 2])
        return jnp.stack([k[..., 0], k1, k2], axis=-1)

    return vpos, swap_last(lo), swap_last(hi), tri_valid


@functools.partial(jax.jit, static_argnames=("res",))
def _mask_and_count(values, res):
    flat = active_cell_mask(values, res).reshape(-1)
    return flat, flat.sum()


@functools.partial(jax.jit, static_argnames=("res",))
def _emit_triangles_mc(values, axis_coords, cells, res):
    """Marching-cubes emission over compacted cells: like
    _emit_triangles but with the generated 256-case table
    (ops/mc_table.py) — up to 5 triangles per cube with vertices on the
    12 axis-aligned CUBE edges (half the triangle budget of the 6-tet
    decomposition).  Winding is baked into the table (inside ->
    outside).  Returns (vpos [A,5,3,3], lo [A,5,3], hi [A,5,3],
    valid [A,5])."""
    n_b = cells.shape[0] // _EMIT_BUCKET
    outs = jax.lax.map(
        lambda c: _emit_triangles_mc_bucket(values, axis_coords, c, res),
        cells.reshape(n_b, _EMIT_BUCKET))
    return tuple(o.reshape((-1,) + o.shape[2:]) for o in outs)


@functools.partial(jax.jit, static_argnames=("res",))
def _emit_triangles_mc_bucket(values, axis_coords, cells, res):
    from .mc_table import EDGES as MC_EDGES
    from .mc_table import MC_MAX_TRIS, MC_TABLE

    rm1 = res - 1
    ok = cells >= 0
    c = jnp.maximum(cells, 0)
    cz = c % rm1
    cy = (c // rm1) % rm1
    cx = c // (rm1 * rm1)
    base = jnp.stack([cx, cy, cz], axis=-1)                      # [A,3]

    # mc_table corner id convention (c = x + 2y + 4z) differs from
    # CUBE_OFFSETS' x-fastest listing order only in labels; use its own
    # coordinates table so ids and geometry agree
    from .mc_table import CORNER_XYZ

    offs = jnp.asarray(CORNER_XYZ)                                # [8,3]
    corner_ijk = base[:, None, :] + offs[None, :, :]              # [A,8,3]
    gid = ((corner_ijk[..., 0] * res + corner_ijk[..., 1]) * res
           + corner_ijk[..., 2]).astype(jnp.int32)                # [A,8]
    val = values[corner_ijk[..., 0], corner_ijk[..., 1], corner_ijk[..., 2]]
    pos = axis_coords[corner_ijk]                                 # [A,8,3]

    inside = (val < 0.0).astype(jnp.int32)                        # [A,8]
    weights = jnp.asarray([1 << k for k in range(8)], jnp.int32)
    case = (inside * weights[None, :]).sum(-1)                    # [A]

    tbl = jnp.asarray(MC_TABLE)                                   # [256,T,3]
    tri_e = tbl[case]                                             # [A,T,3]
    valid = (tri_e[..., 0] >= 0) & ok[:, None]                    # [A,T]
    e = jnp.maximum(tri_e, 0)                                     # [A,T,3]

    epairs = jnp.asarray(MC_EDGES)                                # [12,2]
    ca = epairs[e][..., 0]                                        # [A,T,3]
    cb = epairs[e][..., 1]

    a_val = jnp.take_along_axis(val[:, None, :], ca.reshape(
        ca.shape[0], 1, -1), axis=-1).reshape(ca.shape)
    b_val = jnp.take_along_axis(val[:, None, :], cb.reshape(
        cb.shape[0], 1, -1), axis=-1).reshape(cb.shape)
    a_gid = jnp.take_along_axis(gid[:, None, :], ca.reshape(
        ca.shape[0], 1, -1), axis=-1).reshape(ca.shape)
    b_gid = jnp.take_along_axis(gid[:, None, :], cb.reshape(
        cb.shape[0], 1, -1), axis=-1).reshape(cb.shape)
    flat_a = ca.reshape(ca.shape[0], -1)                          # [A,T*3]
    flat_b = cb.reshape(cb.shape[0], -1)
    a_pos = jnp.take_along_axis(
        pos[:, :, :], flat_a[..., None], axis=1).reshape(
            ca.shape + (3,))                                      # [A,T,3,3]
    b_pos = jnp.take_along_axis(
        pos[:, :, :], flat_b[..., None], axis=1).reshape(
            cb.shape + (3,))

    t = a_val / jnp.where(jnp.abs(a_val - b_val) > 1e-12,
                          a_val - b_val, 1.0)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    vpos = a_pos + t * (b_pos - a_pos)                            # [A,T,3,3]
    lo = jnp.minimum(a_gid, b_gid)                                # [A,T,3]
    hi = jnp.maximum(a_gid, b_gid)
    return vpos, lo, hi, valid


@functools.partial(jax.jit, static_argnames=("res", "size", "method"))
def _emit_from_mask(values, axis_coords, mask_flat, n_active, res,
                    size: int, method: str = "tets"):
    """Device-side cell compaction + triangle emission + valid count.

    Stable argsort on !mask puts active cell ids first in ascending
    order (replacing a host nonzero over the 2 MB mask transfer); the
    valid-triangle count is computed in the same dispatch so the host
    sync that sizes the output gather overlaps the emission itself."""
    order = jnp.argsort(jnp.logical_not(mask_flat), stable=True)
    if size > order.shape[0]:
        # small grids: the bucket exceeds the total cell count — pad so
        # the fixed-size gather below still type-checks (n_active <=
        # total, so padded entries always resolve to -1)
        order = jnp.concatenate(
            [order, jnp.zeros((size - order.shape[0],), order.dtype)])
    cells = jnp.where(jnp.arange(size) < n_active,
                      order[:size].astype(jnp.int32), -1)
    emit = _emit_triangles_mc if method == "mc" else _emit_triangles
    vpos, eklo, ekhi, valid = emit(values, axis_coords, cells, res)
    return vpos, eklo, ekhi, valid, valid.sum()


@functools.partial(jax.jit, static_argnames=("size",))
def _gather_valid(vpos, eklo, ekhi, valid, size: int):
    """Compact valid triangles to the front (device-side): returns
    ([size,3,3] positions, [size,3] lo ids, [size,3] hi ids); entries
    beyond the true count are garbage — callers slice by the count.
    Stable argsort on !valid moves valid entries to the front in order
    (jnp.nonzero's sized lowering costs a ~50 s XLA compile per shape;
    the sort compiles in milliseconds and runs in ~1 ms at 300k
    entries)."""
    flat_v = valid.reshape(-1)
    order = jnp.argsort(jnp.logical_not(flat_v), stable=True)
    tid = order[:size]
    return (vpos.reshape(-1, 3, 3)[tid], eklo.reshape(-1, 3)[tid],
            ekhi.reshape(-1, 3)[tid])


_KEY_SENTINEL = np.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnames=("size",))
def _weld_rank(vpos, eklo, ekhi, valid, count, size: int):
    """Device-side vertex weld, pass 1: compact valid triangles, then
    lexsort all 3*size corner edge keys (lo, hi) and rank them by first
    occurrence.  Vertex order matches what host np.unique over
    lo*res^3+hi would give (lexicographic (lo,hi) == numeric int64
    order), so outputs are bit-identical to the previous host weld.

    Returns (faces [size,3] int32 unique ranks,
             fo_flat [3*size] int32 flat corner index of each unique's
             first occurrence (rank order, garbage past the unique count),
             tri_pos [size,3,3], lo [size,3], hi [size,3],
             n_uniq device scalar)."""
    flat_v = valid.reshape(-1)
    order = jnp.argsort(jnp.logical_not(flat_v), stable=True)
    tid = order[:size]
    tri_pos = vpos.reshape(-1, 3, 3)[tid]
    real = (jnp.arange(size) < count)[:, None]
    lo = jnp.where(real, eklo.reshape(-1, 3)[tid], _KEY_SENTINEL)
    hi = jnp.where(real, ekhi.reshape(-1, 3)[tid], _KEY_SENTINEL)

    klo = lo.reshape(-1)
    khi = hi.reshape(-1)
    sorder = jnp.lexsort((khi, klo))                  # primary lo, then hi
    sk_lo = klo[sorder]
    sk_hi = khi[sorder]
    first = jnp.concatenate(
        [jnp.ones((1,), bool),
         (sk_lo[1:] != sk_lo[:-1]) | (sk_hi[1:] != sk_hi[:-1])])
    rank = (jnp.cumsum(first) - 1).astype(jnp.int32)
    inv = jnp.zeros((3 * size,), jnp.int32).at[sorder].set(rank)
    faces = inv.reshape(size, 3)
    # flat corner index of each unique's first occurrence, in rank order
    fo_flat = sorder[jnp.argsort(jnp.logical_not(first), stable=True)]
    n_uniq = (first & (sk_lo != _KEY_SENTINEL)).sum()
    return faces, fo_flat.astype(jnp.int32), tri_pos, lo, hi, n_uniq


@functools.partial(jax.jit, static_argnames=("vsize",))
def _weld_pack(faces, fo_flat, tri_pos, lo, hi, vsize: int):
    """Device-side vertex weld, pass 2: gather the unique vertices and
    their (lo,hi) edge keys, then pack everything into ONE int32 buffer
    (positions bitcast) so the tunneled host transfer pays a single
    round trip: [vsize*3 verts | size*3 faces | vsize*2 keys]."""
    fo = fo_flat[:vsize]
    verts = tri_pos.reshape(-1, 3)[fo]                      # [vsize,3]
    vlo = lo.reshape(-1)[fo]
    vhi = hi.reshape(-1)[fo]
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(verts, jnp.int32).reshape(-1),
        faces.reshape(-1),
        jnp.stack([vlo, vhi], axis=1).reshape(-1)])


def marching_tets(values: np.ndarray, axis: np.ndarray,
                  return_edge_keys: bool = False
                  ) -> Tuple[np.ndarray, ...]:
    """Extract the zero level set of values [R,R,R] sampled at axis coords
    (axis [R] per dimension, uniform cube grid) via marching tetrahedra.

    Returns (vertices [V,3] float32, faces [F,3] int64) with welded,
    deduplicated vertices and inside->outside winding.  With
    `return_edge_keys`, additionally returns the per-vertex global edge
    key [V] int64 (lo_corner * R^3 + hi_corner) that
    `refine_vertices_bisection` decodes back into grid-edge endpoints.
    """
    return _extract_iso(values, axis, "tets", return_edge_keys)


def marching_cubes(values: np.ndarray, axis: np.ndarray,
                   return_edge_keys: bool = False
                   ) -> Tuple[np.ndarray, ...]:
    """Classic 256-case marching cubes (table generated and certified in
    ops/mc_table.py): ~2x fewer triangles than the 6-tet decomposition
    with vertices only on axis-aligned grid edges — the same extraction
    the reference uses (skimage.measure.marching_cubes at
    models/POCO/generate.py:162 and the vendored libmcubes).  Output
    contract identical to marching_tets."""
    return _extract_iso(values, axis, "mc", return_edge_keys)


def _extract_iso(values, axis, method: str, return_edge_keys: bool):
    res = values.shape[0]
    bucket = _EMIT_BUCKET
    vals_j = jnp.asarray(values, jnp.float32)   # no-op for device fields
    mask_flat, n_active_d = _mask_and_count(vals_j, res)
    n_active = int(n_active_d)                  # host sync 1
    if n_active == 0:
        empty = (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
        return empty + (np.zeros((0,), np.int64),) if return_edge_keys \
            else empty
    A = max(bucket, -(-n_active // bucket) * bucket)

    vpos, eklo, ekhi, valid, count_d = _emit_from_mask(
        vals_j, jnp.asarray(axis, jnp.float32), mask_flat, n_active_d,
        res, A, method)
    # compact AND weld ON DEVICE before the host transfer: the raw
    # [A,6,2,...] buffers are ~20 MB and even the compacted per-triangle
    # corners are ~7 MB (0.45 s through the tunneled TPU at ~15 MB/s);
    # the welded {verts, faces, edge keys} pack into ~2.5 MB moved in
    # ONE transfer
    count = int(count_d)                        # host sync 2
    size = max(bucket, -(-count // bucket) * bucket)
    faces_d, fo_flat, tri_pos_d, lo_d, hi_d, n_uniq_d = _weld_rank(
        vpos, eklo, ekhi, valid, count_d, size)
    n_uniq = int(n_uniq_d)                      # host sync 3
    vsize = max(bucket, -(-n_uniq // bucket) * bucket)
    packed = np.asarray(_weld_pack(faces_d, fo_flat, tri_pos_d, lo_d,
                                   hi_d, vsize))
    verts = packed[:vsize * 3].view(np.float32).reshape(vsize, 3)[:n_uniq]
    faces = packed[vsize * 3:vsize * 3 + size * 3].reshape(
        size, 3)[:count].astype(np.int64)
    keys2 = packed[vsize * 3 + size * 3:].reshape(vsize, 2)[:n_uniq]
    # int64 edge key assembled on HOST: the device runs with x64 disabled
    # and lo*res^3+hi overflows int32 for res >= 48 (key collisions weld
    # random vertex pairs and break refine_vertices_bisection's decode)
    r3 = np.int64(res) * res * res
    uniq = keys2[:, 0].astype(np.int64) * r3 + keys2[:, 1]
    verts = np.ascontiguousarray(verts)
    # drop degenerate faces (repeated vertex ids)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    if return_edge_keys:
        return verts, faces[good], uniq
    return verts, faces[good]


def refine_vertices_bisection(field_fn, verts: np.ndarray,
                              edge_keys: np.ndarray, values: np.ndarray,
                              axis: np.ndarray, iterations: int = 10,
                              chunk: int = 65536) -> np.ndarray:
    """Binary-search every iso-vertex along its grid edge against the TRUE
    field (not the trilinear grid) — the role of the reference's
    10-iteration vertex refinement in
    models/POCO/generate.py:177-273 (dichotomic occupancy search per
    marching-cubes vertex).  TPU shape: one batched field eval per
    bisection step over all vertices at once (a lax-style fixed loop on
    padded chunks), instead of the reference's per-vertex python loop.

    field_fn: [M,3] -> [M] signed field (negative inside).
    Returns refined vertex positions [V,3].
    """
    res = values.shape[0]
    r3 = np.int64(res) * res * res
    keys = np.asarray(edge_keys, np.int64)
    hi = keys % r3
    lo = keys // r3

    def decode(gid):
        z = gid % res
        y = (gid // res) % res
        x = gid // (res * res)
        return np.stack([axis[x], axis[y], axis[z]], axis=-1), (x, y, z)

    pa, (ax_, ay, az) = decode(lo)
    pb, (bx, by, bz) = decode(hi)
    va = values[ax_, ay, az]
    vb = values[bx, by, bz]
    # orient so f(pa) < 0 <= f(pb) (grid values are the true field on the
    # active band — the banded evaluator computes them exactly there)
    swap = va >= 0.0
    pa2 = np.where(swap[:, None], pb, pa)
    pb2 = np.where(swap[:, None], pa, pb)
    pa, pb = pa2.astype(np.float32), pb2.astype(np.float32)

    n = len(pa)
    out = np.empty((n, 3), np.float32)
    for i in range(0, n, chunk):
        end = min(i + chunk, n)
        a = jnp.asarray(np.pad(pa[i:end], ((0, chunk - (end - i)), (0, 0))))
        b = jnp.asarray(np.pad(pb[i:end], ((0, chunk - (end - i)), (0, 0))))
        for _ in range(iterations):
            mid = (a + b) * 0.5
            fm = field_fn(mid)
            inside = (fm < 0.0)[:, None]
            a = jnp.where(inside, mid, a)
            b = jnp.where(inside, b, mid)
        out[i:end] = np.asarray((a + b) * 0.5)[: end - i]
    # keep refined points on their original edge segment (paranoia: a
    # noisy field could bisect to an endpoint; verts stay valid anyway)
    return out
