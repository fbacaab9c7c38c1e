"""Stage: project the mesh + colored points into N views and synthesize
sparse RGB images for inpainting.

Reference counterparts (all re-designed batched-over-views, no Python
per-view loops):
  get_rendered_hard_mask_and_face_idx_batch  ours_utils.py:93-150
  get_point_validation_by_depth              ours_utils.py:153-202
  get_point_validation_by_o3d                ours_utils.py:204-225
  get_sparse_images / get_one_sparse_img     ours_utils.py:848-882,954-1044

The crop-rescale bookkeeping (uv_centers, uv_scales, padding) and the
mask-ratio shrink (threshold 0.82) follow the reference semantics exactly;
shapes stay static by using scale-about-center image resampling instead of
dynamic resizes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraRig
from ..ops import image as oimg
from ..ops import knn as oknn
from ..ops import raster as orast
from ..ops import splat as osplat


class ProjectionData(NamedTuple):
    """Everything downstream stages need about the V views."""

    hard_masks: jnp.ndarray      # [V, cam_res, cam_res] bool (cropped frame)
    face_idxs: jnp.ndarray       # [V, cam_res, cam_res] int32
    mesh_depths: jnp.ndarray     # [V, cam_res, cam_res] float (inf = bg)
    uv_centers: jnp.ndarray      # [V, 1, 2] ndc crop centers
    uv_scales: jnp.ndarray       # [V, 1, 1] ndc crop scales
    padding: float
    point_uvs: jnp.ndarray       # [V, N, 2] in [0,1] (cropped frame)
    point_depths: jnp.ndarray    # [V, N]
    point_validation: jnp.ndarray  # [V, N] bool


def project_views(
    rig: CameraRig,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    points: jnp.ndarray,
    crop: bool = True,
    padding: float = 0.05,
    depth_offset: float = 1e-2,
    raster_chunk: int = 64,
    cull_backface: bool = True,
) -> ProjectionData:
    """Rasterize the mesh and depth-test point visibility in all views."""
    cam_res = rig.res
    all_pts = jnp.concatenate([vertices, points], axis=0)
    ndc, depth = rig.transform(all_pts)            # [V,M,2], [V,M]
    nV = vertices.shape[0]
    vert_ndc, point_ndc = ndc[:, :nV], ndc[:, nV:]
    vert_depth, point_depth = depth[:, :nV], depth[:, nV:]

    if crop:
        lo = vert_ndc.min(axis=1, keepdims=True)   # [V,1,2]
        hi = vert_ndc.max(axis=1, keepdims=True)
        uv_centers = (lo + hi) / 2.0
        uv_scales = (hi - lo).max(axis=2, keepdims=True)  # [V,1,1]
        k = (1.0 - 2.0 * padding)
        vert_ndc = (vert_ndc - uv_centers) / uv_scales * k * 2.0
        point_uvs = (point_ndc - uv_centers) / uv_scales * k + 0.5
    else:
        uv_centers = jnp.zeros((rig.num_views, 1, 2))
        uv_scales = jnp.full((rig.num_views, 1, 1), 2.0)
        padding = 0.0
        point_uvs = point_ndc * 0.5 + 0.5

    # Culling is only safe for closed consistently-wound meshes (our
    # iso-surface output); user-supplied cached OBJs may be open or
    # inconsistently wound, so the pipeline disables it for those.
    rast = orast.rasterize_views(vert_ndc, vert_depth, faces.astype(jnp.int32),
                                 cam_res, raster_chunk,
                                 max_faces_per_tile=256,
                                 cull_backface=cull_backface)
    vis = osplat.point_visibility_by_depth(
        point_uvs * 2.0 - 1.0, point_depth, rast.zbuf, offset=depth_offset)

    return ProjectionData(
        hard_masks=rast.face_id >= 0,
        face_idxs=rast.face_id,
        mesh_depths=rast.zbuf,
        uv_centers=uv_centers,
        uv_scales=uv_scales,
        padding=float(padding),
        point_uvs=point_uvs,
        point_depths=point_depth,
        point_validation=vis,
    )


def add_hpr_visibility(proj: ProjectionData, points_np: np.ndarray,
                       rig: CameraRig, radius: float = 100.0,
                       n_total: int = None,
                       depth_guard: float = 0.03,
                       precomputed: np.ndarray = None) -> ProjectionData:
    """OR-in hidden-point-removal visibility (host convex hull), like the
    reference's point_validation_by_o3d option (demo.py:107-112).
    `n_total` pads the result when the device arrays are bucketed.

    `depth_guard` tightens the reference's plain logical_or
    (demo.py:110): HPR through a convex hull lets a few percent of
    clearly-occluded points through (they then splat back-surface colors
    into the view), so HPR rescues are only accepted where the point is
    not more than `depth_guard` behind the rasterized mesh depth at its
    pixel.  Silhouette/hole pixels (mesh depth = inf) still pass — those
    are the points the OR exists to rescue.  Set 0 to reproduce the
    reference's exact behavior."""
    # `precomputed`: the hulls only depend on (points, eyes), so the
    # pipeline starts them on a background thread at ingest — the
    # single-core tunnel host computes them while the device runs the
    # geometry/unwrap stages
    hpr = (precomputed if precomputed is not None
           else osplat.hidden_point_removal_visibility(
               points_np, np.asarray(rig.eyes), radius))
    if n_total is not None and n_total > hpr.shape[1]:
        pad = np.zeros((hpr.shape[0], n_total - hpr.shape[1]), bool)
        hpr = np.concatenate([hpr, pad], axis=1)
    hpr_j = jnp.asarray(hpr)
    if depth_guard and depth_guard > 0:
        cam_res = proj.mesh_depths.shape[-1]
        pix = jnp.clip((proj.point_uvs * cam_res).astype(jnp.int32), 0,
                       cam_res - 1)
        md = jax.vmap(lambda m, p: m[p[:, 1], p[:, 0]])(
            proj.mesh_depths, pix)                       # [V, N]
        not_behind = (~jnp.isfinite(md)) | (
            proj.point_depths <= md + depth_guard)
        hpr_j = hpr_j & not_behind
    return proj._replace(point_validation=proj.point_validation | hpr_j)


@functools.partial(jax.jit, static_argnames=("refine_res",))
def refine_point_validation(proj: ProjectionData, refine_res: int = 512,
                            window: int = 5,
                            depth_slack: float = 0.03) -> ProjectionData:
    """Remove points whose depth is abnormally far behind their local
    neighborhood — the role of the reference's
    refine_point_validation_by_remove_abnormal_depth
    (ours_utils.py:227-324 + utils_2d.py detect_abnormal_bright_spots,
    default-off).  TPU version: per view, min-splat valid point depths at
    refine_res, take a (window x window) morphological local minimum, and
    invalidate points deeper than local_min + slack."""
    V, N, _ = proj.point_uvs.shape
    pix = jnp.clip(proj.point_uvs * refine_res, 0,
                   refine_res - 1).astype(jnp.int32)

    def per_view(pix_v, depth_v, valid_v):
        img = jnp.full((refine_res, refine_res), jnp.inf)
        d = jnp.where(valid_v, depth_v, jnp.inf)
        img = img.at[pix_v[:, 1], pix_v[:, 0]].min(d)
        local_min = -oimg.dilate(-jnp.where(jnp.isfinite(img), img, 1e6),
                                 window)
        ref = local_min[pix_v[:, 1], pix_v[:, 0]]
        return valid_v & (depth_v <= ref + depth_slack)

    new_valid = jax.vmap(per_view)(pix, proj.point_depths,
                                   proj.point_validation)
    return proj._replace(point_validation=new_valid)


class SparseImages(NamedTuple):
    sparse_imgs: jnp.ndarray    # [V, res, res, 3]
    hard_mask0: jnp.ndarray     # [V, res, res] foreground mask (shrunk)
    hard_mask2: jnp.ndarray     # [V, res, res] known-pixel mask
    scale_factors: jnp.ndarray  # [V] shrink factors (1.0 = none)
    mask_ratios: jnp.ndarray    # [V] final unknown/foreground ratio


@functools.partial(jax.jit, static_argnames=("res", "point_size",
                                             "edge_point_size", "edge_budget"))
def make_sparse_images(
    proj: ProjectionData,
    colors: jnp.ndarray,            # [N, 3] floats in [0,1]
    res: int = 256,
    point_size: int = 1,
    edge_point_size: int = 1,
    mask_ratio_thresh: float = 0.82,
    edge_budget: int = 8192,
) -> SparseImages:
    """Vectorized get_sparse_images (ours_utils.py:848-882): splat visible
    points per view, shrink-to-fit when too sparse, and augment foreground
    inner-edge pixels with their nearest valid point color."""
    cam_res = proj.hard_masks.shape[-1]
    V = proj.hard_masks.shape[0]

    # foreground masks at the inpainting resolution
    if cam_res != res:
        fg = jax.image.resize(
            proj.hard_masks.astype(jnp.float32), (V, res, res),
            method="linear") > 0.5
    else:
        fg = proj.hard_masks

    point_pix = proj.point_uvs * res          # [V,N,2] float (x=col,y=row)

    def per_view(fg_mask, pix, valid):
        fg_num = fg_mask.sum().astype(jnp.float32)
        valid_num = valid.sum().astype(jnp.float32)
        mask_ratio = 1.0 - valid_num / jnp.maximum(fg_num, 1.0)
        wanted_fg = valid_num / (1.0 - mask_ratio_thresh)
        scale = jnp.where(mask_ratio > mask_ratio_thresh,
                          wanted_fg / jnp.maximum(fg_num, 1.0), 1.0)

        # shrink point coords about the image center (ours_utils.py:981-987)
        pix_s = (pix - res / 2.0) * scale + res / 2.0
        rowcol = jnp.clip(pix_s, 0, res - 1).astype(jnp.int32)
        rowcol = jnp.stack([rowcol[:, 1], rowcol[:, 0]], axis=-1)

        fg_s = oimg.rescale_about_center(
            fg_mask.astype(jnp.float32), scale) > 0.5

        sparse = jnp.zeros((res, res, 3))
        sparse = osplat.paint_pixels(sparse, rowcol, colors,
                                     point_size, valid)
        mask2 = (~fg_s).astype(jnp.float32)
        mask2 = osplat.paint_mask(mask2, rowcol, 1.0, point_size, valid)

        # edge augmentation: nearest valid point color at fg inner edges
        edge = oimg.inner_edge_mask(fg_s)
        er, ec = jnp.nonzero(edge, size=edge_budget, fill_value=-1)
        e_ok = er >= 0
        epix = jnp.stack([er, ec], axis=-1)
        _, idx = oknn.knn_2d_pixels(
            epix.astype(jnp.float32), rowcol.astype(jnp.float32), 1,
            ref_valid=valid)
        ecol = colors[idx[:, 0]]
        sparse = osplat.paint_pixels(sparse, epix, ecol,
                                     edge_point_size, e_ok)
        mask2 = osplat.paint_mask(mask2, epix, 1.0, edge_point_size, e_ok)

        mask0 = fg_s.astype(jnp.float32)
        sparse = sparse * mask0[..., None]
        occupied = ((mask2 > 0.5) & fg_s).sum().astype(jnp.float32)
        final_ratio = 1.0 - occupied / jnp.maximum(fg_s.sum(), 1.0)
        return sparse, mask0, mask2, scale, final_ratio

    sparse, m0, m2, scales, ratios = jax.vmap(per_view)(
        fg, point_pix, proj.point_validation)
    return SparseImages(sparse, m0, m2, scales, ratios)
