"""UV-aware 1->4 midpoint subdivision of selected faces (host numpy).

Reference: utils/mesh_utils.py:7-114 subdivide_with_uv (trimesh-style).
Used by the unseen-area completion to raise vertex-color resolution
(unproject.py:112-114).  Like the reference, neighbor faces of subdivided
edges are left untouched (T-junctions are harmless for color diffusion).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _edge_midpoints(idx_tri: np.ndarray, n_existing: int):
    """For faces [S,3] of indices, return per-face-edge new index map and
    the unique edge list. Edges keyed on sorted index pairs."""
    e = np.concatenate([idx_tri[:, [0, 1]], idx_tri[:, [1, 2]],
                        idx_tri[:, [2, 0]]], axis=0)       # [3S,2]
    ek = np.sort(e, axis=1)
    uniq, inv = np.unique(ek, axis=0, return_inverse=True)
    mid_idx = n_existing + inv                              # [3S]
    return mid_idx.reshape(3, -1).T, uniq                   # [S,3], [E,2]


def subdivide_with_uv(
    vertices: np.ndarray,     # [Nv,3]
    faces: np.ndarray,        # [F,3]
    face_uv_idx: np.ndarray,  # [F,3]
    uvs: np.ndarray,          # [Nuv,2]
    face_index: np.ndarray,   # [S] faces to subdivide
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (vertices', faces', uvs', face_uv_idx')."""
    face_index = np.asarray(face_index, np.int64)
    if len(face_index) == 0:
        return vertices, faces, uvs, face_uv_idx
    sel = faces[face_index]                 # [S,3]
    sel_uv = face_uv_idx[face_index]

    mid_v, edges_v = _edge_midpoints(sel, len(vertices))
    mid_uv, edges_uv = _edge_midpoints(sel_uv, len(uvs))
    new_verts = vertices[edges_v].mean(axis=1)
    new_uvs = uvs[edges_uv].mean(axis=1)

    vertices2 = np.concatenate([vertices, new_verts], axis=0)
    uvs2 = np.concatenate([uvs, new_uvs], axis=0)

    # each selected face -> 4 faces: (v0,m01,m20),(m01,v1,m12),
    # (m20,m12,v2),(m01,m12,m20)
    def four(tri, mid):
        a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
        m01, m12, m20 = mid[:, 0], mid[:, 1], mid[:, 2]
        return np.concatenate([
            np.stack([a, m01, m20], 1), np.stack([m01, b, m12], 1),
            np.stack([m20, m12, c], 1), np.stack([m01, m12, m20], 1)], 0)

    keep = np.ones(len(faces), bool)
    keep[face_index] = False
    faces2 = np.concatenate([faces[keep], four(sel, mid_v)], axis=0)
    face_uv2 = np.concatenate([face_uv_idx[keep], four(sel_uv, mid_uv)],
                              axis=0)
    return vertices2, faces2, uvs2, face_uv2
