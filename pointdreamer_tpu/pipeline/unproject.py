"""Stage: Non-Border-First unprojection of inpainted views into the atlas.

Reference: unproject + get_shrinked_per_view_per_pixel_visibility_torch
(pointdreamer/unproject.py:201-475).  The algorithm:

  1. every covered atlas texel has a 3D point (gb_pos); project into all
     views, z-test against the per-view mesh depth -> per-view texel
     visibility,
  2. NBF: detect the *border areas* of each view's visible region (Scharr
     edges of the visibility map minus chart-boundary edges), dilate by
     each kernel in `edge_dilate_kernels` (scaled by res//256), and remove
     them from the candidate set — border texels correspond to grazing /
     seam pixels whose inpainted colors are unreliable,
  3. multi-level fallback over the kernel list for texels left with no
     candidate view,
  4. choose the candidate view maximizing softmax(normal . view_dir),
  5. gather that view's inpainted color into the atlas.

All steps are batched over views and texels — the reference's per-view
Python scatter loop (unproject.py:378-400) becomes one take_along_axis.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import CameraRig
from ..ops import image as oimg
from ..ops import splat as osplat


class UnprojectOut(NamedTuple):
    atlas_img: jnp.ndarray            # [R, R, 3]
    atlas_painted: jnp.ndarray        # [R, R] bool
    texel_view_id: jnp.ndarray        # [R, R] int32, -100 = unseen
    shrunk_visibility: jnp.ndarray    # [V, R, R] (first-kernel shrunk vis)


def shrink_view_visibility(
    atlas_mask: jnp.ndarray,             # [R, R] bool (covered texels)
    per_view_visibility: jnp.ndarray,    # [V, R, R] bool
    kernel_sizes: Sequence[int],
) -> jnp.ndarray:
    """[K, V, R, R]: visibility minus dilated border areas, per kernel.

    Border area = Scharr edges of the per-view visibility map, excluding
    atlas chart-boundary edges, dilated (reference
    get_shrinked_per_view_per_pixel_visibility_torch, unproject.py:429-475).
    """
    if kernel_sizes[0] == 0:
        return per_view_visibility[None]
    bg_edges = oimg.scharr_edges(atlas_mask.astype(jnp.float32) * 255.0) > 125.0
    view_edges = oimg.scharr_edges(
        per_view_visibility.astype(jnp.float32) * 255.0) > (255.0 / 2 - 1)
    view_edges = view_edges & ~bg_edges[None]
    outs = []
    for ks in kernel_sizes:
        border = oimg.dilate(view_edges.astype(jnp.float32) * 255.0,
                             int(ks)) > (255.0 / 2)
        outs.append(per_view_visibility & ~border)
    return jnp.stack(outs, axis=0)


def select_views(
    shrunk: jnp.ndarray,        # [K, V, T] bool, per-kernel shrunk vis
    vis: jnp.ndarray,           # [V, T] bool, unshrunk visibility
    sim: jnp.ndarray,           # [T, V] normal . view_dir similarity
    atlas_mask_flat: jnp.ndarray,  # [T] bool
    complete_by_projection: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NBF multi-level candidate fallback + softmax view choice
    (reference unproject.py:324-367; golden-tested against the extracted
    reference statements in tests/test_reference_parity_pipeline.py).

    Returns (view_id [T] int32 with -100 = unseen, candidate [V,T])."""
    candidate = shrunk[0]                             # [V,T]
    # multi-level NBF fallback (unproject.py:332-346)
    for i in range(1, shrunk.shape[0]):
        has_view = candidate.any(axis=0)
        candidate = candidate | (shrunk[i] & ~has_view[None])
    if complete_by_projection:
        has_view = candidate.any(axis=0)
        candidate = candidate | (vis & ~has_view[None])

    # view priority: softmax over views of normal . base_dir, -100 for
    # non-candidates (unproject.py:360-367)
    weight = jax.nn.softmax(sim, axis=1)
    weight = jnp.where(candidate.T, weight, -100.0)
    view_id = jnp.argmax(weight, axis=1).astype(jnp.int32)  # [T]
    seen = candidate.any(axis=0)
    view_id = jnp.where(seen & atlas_mask_flat, view_id, -100)
    return view_id, candidate


@functools.partial(jax.jit, static_argnames=("kernel_sizes", "view_res",
                                             "complete_by_projection"))
def unproject(
    inpainted_images: jnp.ndarray,     # [V, res, res, 3]
    rig: CameraRig,
    face_normals: jnp.ndarray,         # [F, 3]
    gb_pos: jnp.ndarray,               # [R, R, 3]
    atlas_mask: jnp.ndarray,           # [R, R] bool
    atlas_face_id: jnp.ndarray,        # [R, R] int32
    mesh_depths: jnp.ndarray,          # [V, cam_res, cam_res]
    uv_centers: jnp.ndarray,           # [V, 1, 2]
    uv_scales: jnp.ndarray,            # [V, 1, 1]
    padding: float,
    inpaint_scale_factors: jnp.ndarray,  # [V]
    kernel_sizes: Tuple[int, ...] = (21,),
    view_res: int = 256,
    depth_offset: float = 1e-2,
    complete_by_projection: bool = False,
) -> UnprojectOut:
    R = atlas_mask.shape[0]
    V = rig.num_views
    pts = gb_pos.reshape(-1, 3)                       # [T,3], T=R*R

    ndc, depth = rig.transform(pts)                   # [V,T,2],[V,T]
    k = 1.0 - 2.0 * padding
    base = (ndc - uv_centers) / uv_scales             # [-0.5,0.5]
    uv_no_scale = base * k + 0.5                      # crop frame, no shrink
    uv_scaled = base * inpaint_scale_factors[:, None, None] * k + 0.5

    # per-view texel visibility via mesh depth at cam_res (unproject.py:266)
    vis = osplat.point_visibility_by_depth(
        uv_no_scale * 2.0 - 1.0, depth, mesh_depths, offset=depth_offset)
    vis = vis & atlas_mask.reshape(1, -1)
    vis_img = vis.reshape(V, R, R)

    shrunk = shrink_view_visibility(atlas_mask, vis_img, kernel_sizes)
    tex_norm = face_normals[jnp.maximum(atlas_face_id.reshape(-1), 0)]
    sim = tex_norm @ rig.base_dirs.T                  # [T,V]
    view_id, candidate = select_views(
        shrunk.reshape(len(kernel_sizes), V, -1), vis, sim,
        atlas_mask.reshape(-1), complete_by_projection)

    # gather colors: texel -> chosen view's pixel (one batched gather
    # replacing the reference per-view scatter loop, unproject.py:378-400)
    pix = jnp.clip(uv_scaled * view_res, 0, view_res - 1).astype(jnp.int32)
    rows, cols = pix[..., 1], pix[..., 0]             # [V,T]
    vsel = jnp.maximum(view_id, 0)
    r_sel = jnp.take_along_axis(rows, vsel[None], axis=0)[0]
    c_sel = jnp.take_along_axis(cols, vsel[None], axis=0)[0]
    flat_imgs = inpainted_images.reshape(V * view_res * view_res, 3)
    colors = flat_imgs[(vsel * view_res + r_sel) * view_res + c_sel]
    painted = view_id >= 0
    atlas = jnp.where(painted[:, None], colors, 0.0).reshape(R, R, 3)

    return UnprojectOut(
        atlas_img=atlas,
        atlas_painted=painted.reshape(R, R),
        texel_view_id=view_id.reshape(R, R),
        shrunk_visibility=shrunk[0],
    )
