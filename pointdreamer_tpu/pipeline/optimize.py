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


def _bilinear_base_tables(uv_map, R: int):
    """Base texel id (top-left corner) [P] and corner weights [P,4] in
    corner order (base, base+1, base+R, base+R+1).

    TPU gathers cost ~5.7 ns per INDEX regardless of row width (measured
    through honest non-hoistable microbenches), so the four corners are
    not fetched with a [P,4] index table; instead the loop widens the
    atlas rows to 12 (all four corners' RGB side by side via rolls) and
    issues ONE index per pixel.  At the clamp boundary (x0 == R-1 or
    y0 == R-1) the roll wraps to the wrong texel, but the matching
    weight is exactly zero there (fx/fy == 0 after the clip), so the
    math is identical to clamped corner indices."""
    uv = uv_map.reshape(-1, 2)
    x = jnp.clip(uv[:, 0] * R - 0.5, 0.0, R - 1.0)
    y = jnp.clip(uv[:, 1] * R - 0.5, 0.0, R - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    base = y0 * R + x0                                        # [P]
    w4 = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                    (1 - fx) * fy, fx * fy], axis=1)          # [P,4]
    return base, w4


def _corner_rows(atlas_flat, R: int):
    """[R*R,3] -> [R*R,12]: row i holds the RGB of texels i, i+1, i+R,
    i+R+1 so a single row gather fetches all four bilinear corners."""
    return jnp.concatenate(
        [atlas_flat,
         jnp.roll(atlas_flat, -1, axis=0),
         jnp.roll(atlas_flat, -R, axis=0),
         jnp.roll(atlas_flat, -R - 1, axis=0)], axis=1)


def _grad_to_atlas(g_pix, w4, tb, starts_tb, ends_tb, R: int):
    """Transpose of the fused-corner forward: pixel gradients [K,3]
    (SORTED by base texel) -> dense atlas gradient [R*R,3].

    Per-base-texel sums via cumsum + run-boundary gathers (scatter-adds
    serialize on popular texels), one 12-wide scatter-SET of the touched
    base rows (indices are unique, so no serialization), then the four
    corner lanes shift back into place with rolls."""
    K = g_pix.shape[0]
    contrib = (g_pix[:, None, :] * w4[..., None]).reshape(K, 12)
    c = jnp.cumsum(contrib.T, axis=1)                         # [12,K]
    has = ends_tb >= starts_tb
    hi = c[:, jnp.maximum(ends_tb, 0)]
    lo_idx = starts_tb - 1
    lo = jnp.where((lo_idx >= 0)[None, :], c[:, jnp.maximum(lo_idx, 0)],
                   0.0)
    g_tb = jnp.where(has[None, :], hi - lo, 0.0).T            # [TB,12]
    Gf = jnp.zeros((R * R, 12), g_pix.dtype).at[tb].set(g_tb, mode="drop")
    return (Gf[:, 0:3]
            + jnp.roll(Gf[:, 3:6], 1, axis=0)
            + jnp.roll(Gf[:, 6:9], R, axis=0)
            + jnp.roll(Gf[:, 9:12], R + 1, axis=0))


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

    # sort the active pixels by base texel ONCE so the per-iteration
    # gradient reduction is a cumsum over already-contiguous runs (no
    # in-loop permute), and bucket the touched-base-texel set to a
    # static size for the run-boundary gathers
    base, w4, order, tb, starts_tb, ends_tb = _sorted_pixel_tables(
        uv_sel, R, bucket, K)
    tgt_s = tgt_sel[order]
    msk_s = msk_sel[order]

    atlas_flat, losses = _optimize_loop_fused(
        atlas0.reshape(-1, 3), tgt_s, msk_s, base, w4, tb, starts_tb,
        ends_tb, denom, lr, iterations, R)
    return atlas_flat.reshape(atlas0.shape), losses


def _sorted_pixel_tables(uv_sel, R: int, bucket: int, K: int):
    base, w4 = _bilinear_base_tables(uv_sel, R)
    order = jnp.argsort(base)
    base = base[order]
    w4 = w4[order]
    counts = jnp.bincount(base, length=R * R)       # one scatter, paid once
    starts_full = (jnp.cumsum(counts) - counts).astype(jnp.int32)
    has = counts > 0
    n_tb = int(jnp.sum(has))                        # host sync 2
    TB = min(max(((n_tb + bucket - 1) // bucket) * bucket, bucket),
             min(K, R * R))
    # fill R*R: the gradient scatter drops out-of-range pad rows
    (tb,) = jnp.nonzero(has, size=TB, fill_value=R * R)
    tb_safe = jnp.minimum(tb, R * R - 1)
    in_range = tb < R * R
    starts_tb = jnp.where(in_range, starts_full[tb_safe], 1)
    ends_tb = jnp.where(
        in_range,
        starts_full[tb_safe] + counts[tb_safe].astype(jnp.int32) - 1,
        -1)                                         # pads: ends < starts
    return base, w4, order, tb, starts_tb, ends_tb


@functools.partial(jax.jit, static_argnames=("iterations", "R"))
def _optimize_loop_fused(a0, tgt_s, msk_s, base, w4, tb, starts_tb,
                         ends_tb, denom, lr, iterations: int, R: int):
    """Adam loop over active pixels with the fused-corner layout: forward
    is ONE K-index gather of 12-wide rows, backward is cumsum +
    run-difference + one unique-index scatter-set (see _grad_to_atlas).
    Adam runs on the full flat atlas — never-touched texels keep
    g = m = v = 0 and are left bit-identical."""
    sched = optax.exponential_decay(lr, transition_steps=15, decay_rate=0.5,
                                    staircase=True)
    opt = optax.adam(sched)

    def step(carry, _):
        atlas, opt_state = carry                              # [R*R,3]
        crn = _corner_rows(atlas, R)[base]                    # [K,12]
        rendered = (crn.reshape(-1, 4, 3) * w4[..., None]).sum(axis=1)
        clipped = jnp.clip(rendered, 0.0, 1.0)
        diff = clipped - tgt_s
        loss = (jnp.abs(diff) * msk_s).sum() / denom
        # d (sum(|clip(r)-t| * m) / denom) / dr
        g_pix = (jnp.sign(diff) * msk_s
                 * ((rendered > 0.0) & (rendered < 1.0))) / denom
        g = _grad_to_atlas(g_pix, w4, tb, starts_tb, ends_tb, R)
        updates, opt_state = opt.update(g, opt_state)
        atlas = optax.apply_updates(atlas, updates)
        return (atlas, opt_state), loss

    (atlas, _), losses = jax.lax.scan(
        step, (a0, opt.init(a0)), None, length=iterations)
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
                                   lr, iterations, R)
    return jnp.clip(atlas.reshape(R, R, 3), 0.0, 1.0), losses
