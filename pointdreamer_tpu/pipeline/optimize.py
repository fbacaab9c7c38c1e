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
    # background pixels otherwise all point at face 0's uv — their
    # zero-gradient scatter-adds then serialize on a single texel; spread
    # them uniformly over the atlas instead
    rr = jax.lax.broadcasted_iota(jnp.float32, fg.shape[-2:], 0)
    cc = jax.lax.broadcasted_iota(jnp.float32, fg.shape[-2:], 1)
    uniform = jnp.stack([cc, rr], axis=-1) / float(render_res)
    uv_map = jnp.where(fg[..., None], uv_map, uniform[None])
    return uv_map, fg


def _bilinear_tables(uv_map, R: int):
    """Precompute the fixed bilinear sampling structure: corner texel ids
    [P,4], weights [P,4], and the sorted-run layout that lets the
    transpose (gradient) be computed with cumsum+gathers instead of a
    scatter-add (XLA TPU scatters serialize on popular texels)."""
    uv = uv_map.reshape(-1, 2)
    x = jnp.clip(uv[:, 0] * R - 0.5, 0.0, R - 1.0)
    y = jnp.clip(uv[:, 1] * R - 0.5, 0.0, R - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, R - 1)
    y1 = jnp.minimum(y0 + 1, R - 1)
    fx = x - x0
    fy = y - y0
    idx = jnp.stack([y0 * R + x0, y0 * R + x1,
                     y1 * R + x0, y1 * R + x1], axis=1)       # [P,4]
    w = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                   (1 - fx) * fy, fx * fy], axis=1)           # [P,4]

    flat_idx = idx.reshape(-1)
    order = jnp.argsort(flat_idx)
    # run boundaries from per-texel counts (one bincount scatter, paid
    # once per shape) instead of two 1M-query searchsorted binary searches
    counts = jnp.bincount(flat_idx, length=R * R)
    starts = jnp.cumsum(counts) - counts
    ends = starts + counts - 1                      # -1 when count == 0
    return idx, w, order, starts.astype(jnp.int32), ends.astype(jnp.int32)


_bilinear_tables_jit = jax.jit(lambda uv, R: _bilinear_tables(uv, R),
                               static_argnames=("R",))


def _transpose_to_atlas(g_pix, w, order, starts, ends):
    """Scatter-free A^T g: sort-order permute + cumsum + run-difference
    gathers.  g_pix [P,3] pixel gradients -> [R*R,3] atlas gradients.
    Channel-major layout: cumsum/gather on [3, 4P] so the minor dim spans
    the 128 lanes (a 3-wide minor dim wastes 125/128 of the VPU)."""
    contrib = (g_pix[:, None, :] * w[..., None]).reshape(-1, 3)   # [4P,3]
    T = contrib[order].T                                          # [3,4P]
    c = jnp.cumsum(T, axis=1)
    has = ends >= starts
    hi = c[:, jnp.maximum(ends, 0)]
    lo_idx = starts - 1
    lo = jnp.where((lo_idx >= 0)[None, :], c[:, jnp.maximum(lo_idx, 0)],
                   0.0)
    return jnp.where(has[None, :], hi - lo, 0.0).T


def _optimize_loop(atlas0, targets, uv_map, loss_mask, lr, iterations: int,
                   R: int):
    """Adam on the atlas with a hand-derived L1 gradient.

    Pixels with a zero loss mask contribute nothing on EVERY iteration
    (the mask is constant through the loop), and on real shapes only
    ~25% of render pixels are foreground — so the loop first compacts to
    the active pixel set (device-side nonzero into a bucketed static
    size; one scalar fetch picks the bucket) and runs all gathers on the
    compacted arrays.  Loss normalization keeps the FULL pixel count, so
    the math is bit-identical to the dense version."""
    tgt_flat = targets.reshape(-1, 3)
    mask_flat = loss_mask.reshape(-1)
    uv_flat = uv_map.reshape(-1, 2)
    P_total = tgt_flat.shape[0]
    denom = float(P_total * 3)

    n_active = int(jnp.sum(mask_flat > 0))          # host sync 1
    bucket = 32768
    K = min(max(((n_active + bucket - 1) // bucket) * bucket, bucket),
            P_total)
    (sel,) = jnp.nonzero(mask_flat > 0, size=K, fill_value=-1)
    valid = sel >= 0
    safe = jnp.maximum(sel, 0)
    # padding rows: distinct uniform uvs so their (zero) contributions
    # don't all serialize on one texel
    j = jnp.arange(K)
    pad_uv = jnp.stack([((j % R) + 0.5) / R,
                        ((j // R % R) + 0.5) / R], axis=-1)
    uv_sel = jnp.where(valid[:, None], uv_flat[safe], pad_uv)
    tgt_sel = jnp.where(valid[:, None], tgt_flat[safe], 0.0)
    msk_sel = jnp.where(valid, mask_flat[safe], 0.0)[:, None]

    # --- texel compaction: only texels touched by some corner ever get a
    # nonzero gradient, and under Adam a never-touched texel keeps m=v=0
    # and is never updated — so the optimization state, the run-boundary
    # gathers, and the Adam update all shrink from R^2 to the touched set.
    idx, w, order, starts, ends = _bilinear_tables_jit(uv_sel, R)
    has_run = ends >= starts
    n_texels = int(jnp.sum(has_run))                # host sync 2
    KT = min(max(((n_texels + bucket - 1) // bucket) * bucket, bucket),
             R * R)
    # fill with R*R: keeps the list sorted for searchsorted, and the
    # final scatter-back drops out-of-range rows
    (tsel,) = jnp.nonzero(has_run, size=KT, fill_value=R * R)
    tvalid = tsel < R * R
    tsafe = jnp.minimum(tsel, R * R - 1)
    starts_c = jnp.where(tvalid, starts[tsafe], 0)
    ends_c = jnp.where(tvalid, ends[tsafe], -1)     # has=False for pads
    idx_c = jnp.searchsorted(tsel, idx).astype(jnp.int32)   # [K,4]
    a0_c = atlas0.reshape(-1, 3)[tsafe]

    atlas_c, losses = _optimize_loop_compact(
        a0_c, tgt_sel, msk_sel, idx_c, w, order, starts_c, ends_c, denom,
        lr, iterations)
    atlas = atlas0.reshape(-1, 3).at[tsel].set(atlas_c, mode="drop")
    return atlas.reshape(atlas0.shape), losses


@functools.partial(jax.jit, static_argnames=("iterations",))
def _optimize_loop_compact(a0_c, tgt_sel, msk_sel, idx_c, w, order,
                           starts_c, ends_c, denom, lr, iterations: int):
    """Compact Adam loop over (active pixels) x (touched texels): forward
    is 4 gathers, backward is the scatter-free transpose above (XLA TPU
    scatter-adds serialize on popular texels and cost ~10x this)."""
    sched = optax.exponential_decay(lr, transition_steps=15, decay_rate=0.5,
                                    staircase=True)
    opt = optax.adam(sched)

    def step(carry, _):
        atlas_c, opt_state = carry
        rendered = (atlas_c[idx_c] * w[..., None]).sum(axis=1)   # [K,3]
        clipped = jnp.clip(rendered, 0.0, 1.0)
        diff = clipped - tgt_sel
        loss = (jnp.abs(diff) * msk_sel).sum() / denom
        # d (sum(|clip(r)-t| * m) / denom) / dr
        g_pix = (jnp.sign(diff) * msk_sel
                 * ((rendered > 0.0) & (rendered < 1.0))) / denom
        g = _transpose_to_atlas(g_pix, w, order, starts_c, ends_c)
        updates, opt_state = opt.update(g, opt_state)
        atlas_c = optax.apply_updates(atlas_c, updates)
        return (atlas_c, opt_state), loss

    (atlas_c, _), losses = jax.lax.scan(
        step, (a0_c, opt.init(a0_c)), None, length=iterations)
    return atlas_c, losses


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
                                   lr, iterations, R)
    return jnp.clip(atlas.reshape(R, R, 3), 0.0, 1.0), losses
