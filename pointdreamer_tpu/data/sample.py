"""Build input colored point clouds from textured meshes.

Reference: data/sample_colored_pc_from_mesh.py (kaolin area-weighted
sample_points carrying face UVs + per-material grid_sample texture lookup
with GL_REPEAT wrap and v-flip, :132-185, :226).

Here: area-weighted barycentric sampling (host RNG for reproducibility)
+ device bilinear texture lookup through the mesh's UV layout.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core import io as pio
from ..ops.image import bilinear_sample


def sample_colored_pc_from_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    uvs: Optional[np.ndarray] = None,
    face_uv_idx: Optional[np.ndarray] = None,
    texture: Optional[np.ndarray] = None,   # [H,W,3] float, row0 = v~0
    n_points: int = 30000,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Returns dict(coords, colors, normals, uvs) like the reference's
    npy outputs (sample_colored_pc_from_mesh.py:226-290)."""
    rng = np.random.default_rng(seed)
    fv = vertices[faces]
    cross = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    area = np.linalg.norm(cross, axis=1) / 2.0
    nrm = cross / np.maximum(np.linalg.norm(cross, axis=1, keepdims=True),
                             1e-12)
    prob = area / area.sum()
    fid = rng.choice(len(faces), n_points, p=prob)
    u = rng.random((n_points, 1))
    v = rng.random((n_points, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    w = 1 - u - v
    pts = fv[fid, 0] * w + fv[fid, 1] * u + fv[fid, 2] * v

    out = {
        "coords": pts.astype(np.float32),
        "normals": nrm[fid].astype(np.float32),
    }
    if uvs is not None and texture is not None:
        fuv = uvs[face_uv_idx[fid]]                      # [N,3,2]
        uv = fuv[:, 0] * w + fuv[:, 1] * u + fuv[:, 2] * v
        uv = uv % 1.0                                    # GL_REPEAT wrap
        colors = np.asarray(bilinear_sample(jnp.asarray(texture),
                                            jnp.asarray(uv)))
        out["uvs"] = uv.astype(np.float32)
        out["colors"] = np.clip(colors, 0, 1).astype(np.float32)
    else:
        out["colors"] = np.full((n_points, 3), 0.5, np.float32)
    return out


def sample_from_obj(obj_path: str, n_points: int = 30000, seed: int = 0,
                    out_ply: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Load an exported OBJ(+PNG) and sample a colored cloud from it."""
    m = pio.load_obj(obj_path)
    tex = None
    tex_path = obj_path.replace(".obj", ".png")
    import os

    if os.path.exists(tex_path):
        tex = pio.load_rgb(tex_path)[::-1].copy()   # undo export v-flip
    out = sample_colored_pc_from_mesh(
        m["vertices"], m["faces"], m.get("uvs"), m.get("face_uv_idx"),
        tex, n_points, seed)
    if out_ply:
        pio.save_colored_pc_ply(out["coords"], out["colors"], out_ply)
    return out
