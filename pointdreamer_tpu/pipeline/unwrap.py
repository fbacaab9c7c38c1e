"""UV unwrapping + texture-atlas baking.

Replaces xatlas (C++, reference models/get3d/extract_texture_map.py:21,43)
with a self-contained two-part design:

  host  : box-projection chart unwrap — faces are labeled by dominant
          signed normal axis (6 bins), grown into edge-connected charts,
          orthographically projected along their axis, and shelf-packed
          into the unit square with per-chart gutters.  Chart topology is
          inherently sequential (union-find) so it stays on host, exactly
          like xatlas does in the reference.
  device: atlas bake — rasterize the UV triangles (ops.raster) at the
          atlas resolution and interpolate world positions, reproducing
          xatlas_uvmap_w_face_id's outputs (uvs, face_uv_idx, gb_pos,
          mask, per-pixel face id; extract_texture_map.py:42-64).

Box projection yields more seams than xatlas' LSCM charts, but every seam
is handled downstream by NBF unprojection + gutter dilation, and the
projection is distortion-free for near-axis faces.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import raster as orast

# for axis bin a (0..5 = +x,-x,+y,-y,+z,-z): project along axis, keeping
# (u_axis, v_axis) with a sign making the projection orientation-preserving
_PROJ = {
    0: (1, 2, 1.0),   # +x -> (y, z)
    1: (1, 2, -1.0),  # -x -> (y, -z)
    2: (0, 2, -1.0),  # +y -> (x, -z)
    3: (0, 2, 1.0),   # -y -> (x, z)
    4: (0, 1, -1.0),  # +z -> (x, -y)
    5: (0, 1, 1.0),   # -z -> (x, y)
}


def _face_axis_labels(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    fv = vertices[faces]
    n = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    dirs = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], dtype=np.float64)
    return np.argmax(n @ dirs.T, axis=1)


class _UnionFind:
    def __init__(self, n):
        self.p = np.arange(n)

    def find(self, x):
        root = x
        while self.p[root] != root:
            root = self.p[root]
        while self.p[x] != root:
            self.p[x], x = root, self.p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[rb] = ra


def unwrap(vertices: np.ndarray, faces: np.ndarray,
           atlas_res: int = 1024, gutter_px: int = 4
           ) -> Tuple[np.ndarray, np.ndarray]:
    """Compute per-chart UVs.

    Returns (uvs [Nuv,2] in [0,1], face_uv_idx [F,3] int64) — same contract
    as xatlas.parametrize in extract_texture_map.py:43-50.
    """
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    nf = len(faces)
    labels = _face_axis_labels(vertices, faces)

    # edge -> faces map for connectivity
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]], axis=0)
    ekey = np.sort(edges, axis=1)
    ekey = ekey[:, 0] * (faces.max() + 1) + ekey[:, 1]
    order = np.argsort(ekey, kind="stable")
    sk = ekey[order]
    fid_of_edge = np.tile(np.arange(nf), 3)[order]
    uf = _UnionFind(nf)
    same = np.nonzero(sk[1:] == sk[:-1])[0]
    for i in same:
        fa, fb = fid_of_edge[i], fid_of_edge[i + 1]
        if labels[fa] == labels[fb]:
            uf.union(fa, fb)
    roots = np.array([uf.find(i) for i in range(nf)])

    # merge tiny charts into an adjacent chart when every face still has
    # a positive projection onto the absorber's axis (fewer seams ->
    # fewer NBF-masked border texels and less gutter waste)
    fv = vertices[faces]
    fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
    dirs = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], dtype=np.float64)
    adj_pairs = np.stack([fid_of_edge[same], fid_of_edge[same + 1]], 1)
    for _ in range(4):
        ids, counts = np.unique(roots, return_counts=True)
        size_of = dict(zip(ids, counts))
        small = {i for i, c in zip(ids, counts) if c < 20}
        if not small:
            break
        changed = False
        for fa, fb in adj_pairs:
            if roots[fa] == roots[fb]:
                continue
            for s_f, big_f in ((fa, fb), (fb, fa)):
                rs, rb2 = roots[s_f], roots[big_f]
                if rs in small and size_of.get(rb2, 0) >= size_of.get(rs, 0):
                    members = roots == rs
                    axis = labels[big_f]
                    if (fn[members] @ dirs[axis]).min() > 0.05:
                        roots[members] = rb2
                        labels[members] = axis
                        changed = True
                        break
        if not changed:
            break

    chart_ids, chart_of_face = np.unique(roots, return_inverse=True)
    n_charts = len(chart_ids)

    # per-chart 2D coordinates for every (chart, vertex) pair
    uvs_list = []
    face_uv_idx = np.zeros((nf, 3), np.int64)
    rects = []  # (chart, w, h) world units
    chart_data = []
    for c in range(n_charts):
        fmask = chart_of_face == c
        cfaces = faces[fmask]
        label = labels[np.nonzero(fmask)[0][0]]
        ua, va, sgn = _PROJ[label]
        vids, local = np.unique(cfaces.reshape(-1), return_inverse=True)
        pts2 = np.stack(
            [vertices[vids, ua], sgn * vertices[vids, va]], axis=1)
        pts2 -= pts2.min(axis=0, keepdims=True)
        w, h = pts2.max(axis=0) if len(pts2) else (0.0, 0.0)
        chart_data.append((fmask, local.reshape(-1, 3), pts2))
        rects.append((max(w, 1e-9), max(h, 1e-9)))

    # shelf packing (sorted by height), world units + gutters; gutter
    # shrinks adaptively when many charts must fit a small atlas
    rects = np.array(rects)
    order = np.argsort(-rects[:, 1])
    total_area = (rects[:, 0] * rects[:, 1]).sum()

    def try_pack(gutter_frac):
        side = max(np.sqrt(total_area) * 1.15, rects.max() + 1e-9)
        for _ in range(32):
            scale = (1.0 - 2 * gutter_frac) / side
            placements = np.zeros((n_charts, 2))
            x = y = shelf_h = 0.0
            ok = True
            for c in order:
                w = rects[c, 0] * scale + 2 * gutter_frac
                h = rects[c, 1] * scale + 2 * gutter_frac
                if w > 1.0 or h > 1.0:
                    ok = False
                    break
                if x + w > 1.0:
                    y += shelf_h
                    x = 0.0
                    shelf_h = 0.0
                if y + h > 1.0:
                    ok = False
                    break
                placements[c] = (x + gutter_frac, y + gutter_frac)
                x += w
                shelf_h = max(shelf_h, h)
            if ok:
                return scale, placements
            side *= 1.12
        return None

    packed = None
    gutter_frac = gutter_px / float(atlas_res)
    for _ in range(8):
        packed = try_pack(gutter_frac)
        if packed is not None:
            break
        gutter_frac /= 2.0
    if packed is None:
        raise RuntimeError("chart packing failed to converge")
    scale, placements = packed

    # assemble global uv array
    uv_offset = 0
    uvs_list = []
    for c in range(n_charts):
        fmask, local_faces, pts2 = chart_data[c]
        uv = pts2 * scale + placements[c][None, :]
        uvs_list.append(uv)
        face_uv_idx[fmask] = local_faces + uv_offset
        uv_offset += len(uv)
    uvs = np.concatenate(uvs_list, axis=0)
    return uvs.astype(np.float32), face_uv_idx


def bake_atlas(vertices, faces, uvs, face_uv_idx, resolution: int,
               chunk: int = 64) -> Dict[str, jnp.ndarray]:
    """Rasterize the UV layout into per-texel buffers.

    Returns dict with keys matching the reference xatlas_dict
    (demo.py:441-448): 'uvs', 'mesh_tex_idx', 'gb_pos' [R,R,3] world
    position per texel, 'mask' [R,R] bool coverage,
    'per_atlas_pixel_face_id' [R,R] int32 (-1 empty).

    Texel row r corresponds to v = (r+0.5)/R (row 0 = v~0); the final PNG
    is flipped at save time exactly like the reference (demo.py:297).
    """
    uvs_j = jnp.asarray(uvs)
    ndc = uvs_j * 2.0 - 1.0
    depth = jnp.ones((uvs_j.shape[0],), jnp.float32)
    fuv = jnp.asarray(face_uv_idx, jnp.int32)
    if resolution % 32 == 0:
        out = orast.rasterize_tiled(ndc, depth, fuv, resolution)
    else:
        out = orast.rasterize(ndc, depth, fuv, resolution, chunk)
    mask = out.face_id >= 0
    # gb_pos: interpolate *world* positions — bary is wrt uv triangles,
    # world attributes indexed via the same face's world vertex ids
    gb_pos = orast.interpolate(
        jnp.asarray(vertices), jnp.asarray(faces, jnp.int32),
        out.face_id, out.bary)
    gb_pos = jnp.where(mask[..., None], gb_pos, 0.0)
    return {
        "uvs": uvs_j,
        "mesh_tex_idx": jnp.asarray(face_uv_idx),
        "gb_pos": gb_pos,
        "mask": mask,
        "per_atlas_pixel_face_id": out.face_id,
    }
