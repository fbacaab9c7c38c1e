"""Stage: refine the texture atlas by differentiable-render optimization.

Reference: optimize_color (pointdreamer/ours_utils.py:1583-1785): Adam
lr 5e-2, 100 iters, StepLR(15, 0.5), L1 between atlas-rendered views and
the inpainted images, masked by foreground and (mode 'ours') the shrunk
per-view atlas visibility.

TPU re-design: geometry is fixed during the optimization, so the per-view
pixel -> uv map is rasterized ONCE; the optimization loop is a pure
`lax.scan` of { bilinear atlas gather -> masked L1 -> optax.adam update }
with no rasterizer in the loop (the reference re-rasterizes implicitly via
texture_mapping each iteration on GPU).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.camera import CameraRig
from ..ops import image as oimg
from ..ops import raster as orast


def precompute_view_uv_maps(
    rig: CameraRig,
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    uvs: jnp.ndarray,
    face_uv_idx: jnp.ndarray,
    uv_centers: jnp.ndarray,
    uv_scales: jnp.ndarray,
    padding: float,
    inpaint_scale_factors: jnp.ndarray,
    render_res: int,
    raster_chunk: int = 64,
):
    """Rasterize all views once; return (uv_map [V,r,r,2], fg [V,r,r])."""
    ndc, depth = rig.transform(vertices)
    k = 1.0 - 2.0 * padding
    base = (ndc - uv_centers) / uv_scales
    ndc2 = jnp.clip(base * inpaint_scale_factors[:, None, None] * k + 0.5,
                    0.0, 1.0) * 2.0 - 1.0
    rast = orast.rasterize_views(ndc2, depth, faces.astype(jnp.int32),
                                 render_res, raster_chunk,
                                 max_faces_per_tile=256, cull_backface=True)
    uv_map = jax.vmap(
        lambda fid, bary: orast.interpolate(
            uvs, face_uv_idx.astype(jnp.int32), fid, bary)
    )(rast.face_id, rast.bary)
    fg = rast.face_id >= 0
    return uv_map, fg


@functools.partial(jax.jit, static_argnames=("iterations",))
def _optimize_loop(atlas0, targets, uv_map, loss_mask, lr, iterations: int):
    sched = optax.exponential_decay(lr, transition_steps=15, decay_rate=0.5,
                                    staircase=True)
    opt = optax.adam(sched)

    def loss_fn(atlas):
        rendered = oimg.bilinear_sample(atlas, uv_map)      # [V,r,r,3]
        diff = jnp.abs(jnp.clip(rendered, 0.0, 1.0) - targets)
        return (diff * loss_mask[..., None]).mean()

    def step(carry, _):
        atlas, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(atlas)
        updates, opt_state = opt.update(g, opt_state)
        atlas = optax.apply_updates(atlas, updates)
        return (atlas, opt_state), loss

    (atlas, _), losses = jax.lax.scan(
        step, (atlas0, opt.init(atlas0)), None, length=iterations)
    return atlas, losses


def optimize_color(
    atlas_img: jnp.ndarray,              # [R,R,3] init (or None -> random)
    inpainted_images: jnp.ndarray,       # [V,res,res,3]
    rig: CameraRig,
    vertices, faces, uvs, face_uv_idx,
    uv_centers, uv_scales, padding, inpaint_scale_factors,
    shrunk_visibility: Optional[jnp.ndarray] = None,  # [V,R,R] atlas space
    render_res: int = 1024,
    lr: float = 5e-2,
    iterations: int = 100,
    rng_key=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (optimized atlas [R,R,3], final per-iteration losses)."""
    R = 1024 if atlas_img is None else atlas_img.shape[0]
    if atlas_img is None:  # optimize_from='scratch' (ours_utils.py:1611)
        key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
        atlas_img = jax.random.uniform(key, (R, R, 3))

    uv_map, fg = precompute_view_uv_maps(
        rig, vertices, faces, uvs, face_uv_idx, uv_centers, uv_scales,
        padding, inpaint_scale_factors, render_res)

    targets = jax.vmap(
        lambda im: jax.image.resize(im, (render_res, render_res, 3),
                                    method="linear"))(inpainted_images)
    loss_mask = fg.astype(jnp.float32)
    if shrunk_visibility is not None:   # mode 'ours' (ours_utils.py:1749-1752)
        pix = jnp.clip((uv_map * R).astype(jnp.int32), 0, R - 1)
        svis = jax.vmap(lambda sv, p: sv[p[..., 1], p[..., 0]])(
            shrunk_visibility.astype(jnp.float32), pix)
        loss_mask = loss_mask * svis
    targets = targets * loss_mask[..., None]

    atlas, losses = _optimize_loop(atlas_img, targets, uv_map, loss_mask,
                                   lr, iterations)
    return jnp.clip(atlas, 0.0, 1.0), losses
