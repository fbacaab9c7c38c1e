"""Textured-mesh rendering for evaluation.

Reference: utils/camera_utils.py render_textured_mesh (:379) and
render_textured_meshes_shapenet2 (:680) — render 20 views at 512^2 of
GT/predicted textured meshes for LPIPS/FID/PSNR/SSIM scoring
(data/render_meshes.py, data/run_evaluation.py).

One jitted pass per mesh: rasterize all views (tiled kernel), interpolate
UVs, bilinear-sample the atlas; background composited to a constant color
(the reference composites its green-screen renders to white at
run_evaluation.py:23).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraRig, make_camera_rig
from ..ops.image import bilinear_sample
from ..ops import raster as orast


def render_textured_views(
    rig: CameraRig,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    uvs: jnp.ndarray,
    face_uv_idx: jnp.ndarray,
    atlas_img: jnp.ndarray,          # [R,R,3], row 0 = v~0 (in-memory)
    res: Optional[int] = None,
    background: float = 1.0,
    light_dir: Optional[jnp.ndarray] = None,
    ambient: float = 0.35,
) -> jnp.ndarray:
    """Returns [V, res, res, 3] renders.  `light_dir` adds the reference's
    optional lambertian shading (camera_utils.py:379 render_textured_mesh
    lighting path): ambient + (1-ambient)*max(n.l, 0)."""
    res = res or rig.res
    faces = faces.astype(jnp.int32)
    ndc, depth = rig.transform(vertices)
    rast = orast.rasterize_views(ndc, depth, faces, res)
    uv_map = jax.vmap(
        lambda fid, bary: orast.interpolate(
            uvs, face_uv_idx.astype(jnp.int32), fid, bary)
    )(rast.face_id, rast.bary)
    img = jax.vmap(lambda uv: bilinear_sample(atlas_img, uv))(uv_map)
    if light_dir is not None:
        l = jnp.asarray(light_dir, jnp.float32)
        l = l / jnp.maximum(jnp.linalg.norm(l), 1e-12)
        fn = orast.face_normals(vertices, faces)
        shade = jnp.clip(jnp.abs(fn[jnp.maximum(rast.face_id, 0)] @ l),
                         0.0, 1.0)
        img = img * (ambient + (1.0 - ambient) * shade)[..., None]
    fg = (rast.face_id >= 0)[..., None]
    return jnp.where(fg, jnp.clip(img, 0.0, 1.0), background)


def render_vertex_color_views(
    rig: CameraRig,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    vertex_colors: jnp.ndarray,       # [N,3] in [0,1]
    res: Optional[int] = None,
    background: float = 1.0,
) -> jnp.ndarray:
    """Per-vertex-color renderer (reference camera_utils.py:735)."""
    res = res or rig.res
    ndc, depth = rig.transform(vertices)
    rast = orast.rasterize_views(ndc, depth, faces.astype(jnp.int32), res)
    img = jax.vmap(
        lambda fid, bary: orast.interpolate(
            vertex_colors, faces.astype(jnp.int32), fid, bary)
    )(rast.face_id, rast.bary)
    fg = (rast.face_id >= 0)[..., None]
    return jnp.where(fg, jnp.clip(img, 0.0, 1.0), background)


def render_normal_views(
    rig: CameraRig,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    res: Optional[int] = None,
    background: float = 1.0,
) -> jnp.ndarray:
    """Face-normal map renderer, world-space normals encoded n*0.5+0.5
    (reference camera_utils.py:857)."""
    res = res or rig.res
    faces = faces.astype(jnp.int32)
    ndc, depth = rig.transform(vertices)
    rast = orast.rasterize_views(ndc, depth, faces, res)
    fn = orast.face_normals(vertices, faces)              # [F,3]
    fid = jnp.maximum(rast.face_id, 0)
    img = fn[fid] * 0.5 + 0.5
    fg = (rast.face_id >= 0)[..., None]
    return jnp.where(fg, img, background)


def render_mask_views(
    rig: CameraRig,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    res: Optional[int] = None,
) -> jnp.ndarray:
    """Foreground-mask renderer (reference camera_utils.py:556)."""
    res = res or rig.res
    ndc, depth = rig.transform(vertices)
    rast = orast.rasterize_views(ndc, depth, faces.astype(jnp.int32), res)
    return rast.face_id >= 0


def render_mesh_dir(obj_path: str, out_dir: str, num_views: int = 20,
                    res: int = 512, distribution: str = "blender"):
    """Render an exported model_normalized.obj(+png) to view PNGs
    (reference data/render_meshes.py:28-50)."""
    import os

    from ..core import io as pio

    m = pio.load_obj(obj_path)
    tex_path = obj_path.replace(".obj", ".png")
    atlas = pio.load_rgb(tex_path)[::-1].copy()   # undo export flip
    rig = make_camera_rig(num_views, res=res, distribution=distribution)
    imgs = render_textured_views(
        rig, jnp.asarray(m["vertices"]), jnp.asarray(m["faces"]),
        jnp.asarray(m["uvs"]), jnp.asarray(m["face_uv_idx"]),
        jnp.asarray(atlas), res)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(imgs.shape[0]):
        p = os.path.join(out_dir, f"{i:03d}.png")
        pio.save_rgb(np.asarray(imgs[i]), p)
        paths.append(p)
    return paths
