"""Stage: write the textured mesh (OBJ + MTL + PNG).

Reference: save_textured_mesh (demo.py:264-307) — savemeshtes2 OBJ writer,
texture PNG flipped vertically (v=0 at the bottom row, OBJ convention),
plus an RGBA atlas-without-background debug image.
"""
from __future__ import annotations

import os

import numpy as np

from ..core import io as pio


def save_textured_mesh(vertices, uvs, faces, face_uv_idx, atlas_img, mask,
                       output_root: str, name: str = "model_normalized"):
    """atlas_img [R,R,3] float in [0,1] with row 0 = v~0; mask [R,R] bool."""
    models_dir = os.path.join(output_root, "models")
    others_dir = os.path.join(output_root, "others")
    os.makedirs(models_dir, exist_ok=True)
    os.makedirs(others_dir, exist_ok=True)

    obj_path = os.path.join(models_dir, f"{name}.obj")
    pio.save_textured_obj(np.asarray(vertices), np.asarray(uvs),
                          np.asarray(faces), np.asarray(face_uv_idx),
                          obj_path)
    atlas = np.asarray(atlas_img)
    pio.save_rgb(atlas, os.path.join(models_dir, f"{name}.png"),
                 flip_vertical=True)

    m = np.asarray(mask).astype(np.float32)
    rgba = np.concatenate([atlas, m[..., None]], axis=-1)
    pio.save_rgb(rgba, os.path.join(others_dir, "atlas_wo_background.png"),
                 flip_vertical=True)
    return obj_path
