"""Stage: complete atlas regions unseen from every view.

Reference counterparts (pointdreamer/unproject.py):
  paint_invisible_areas_by_neighbors (:93-196) — Unique3D-style Laplacian
      vertex-color diffusion over a UV-aware subdivided mesh (default),
  dilate_atlas (:480-504) — nearest-fill of uncovered texels,
  paint_invisible_areas_by_optimize (:39-91) — tri-plane color-field fit
      (models.texture_field.fit_and_paint).

The Laplacian diffusion runs on device as segment-sum rounds inside
lax.while_loop; the mesh subdivision is host numpy (ops.subdivide).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import image as oimg
from ..ops import subdivide as osub


@jax.jit
def dilate_atlas(atlas_img: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Nearest-fill every texel outside `mask` (covered set) — fills chart
    gutters so bilinear texture lookups never bleed background
    (reference dilate_atlas, unproject.py:480-504)."""
    return oimg.nearest_fill(atlas_img, mask)


def _bucket(n: int, quantum: int = 4096) -> int:
    """Round up to the padding quantum so the jitted stages below see a
    small set of shapes across a dataset instead of one per mesh
    (post-subdivision vertex/edge counts are unique per shape)."""
    return max(quantum, -(-n // quantum) * quantum)


@jax.jit
def _gather_vertex_colors(atlas_img, atlas_painted, rows, cols):
    return atlas_img[rows, cols], atlas_painted[rows, cols]


@jax.jit
def _write_back_and_fill(atlas_img, atlas_painted, rows, cols,
                         colors, prev_colors, was_painted, valid):
    # pad entries (valid=False) re-write their gathered value at (0,0)
    # and leave the painted mask untouched — a no-op scatter
    keep = was_painted | ~valid
    atlas2 = atlas_img.at[rows, cols].set(
        jnp.where(keep[:, None], prev_colors, colors))
    painted2 = atlas_painted.at[rows, cols].max(valid)
    return oimg.nearest_fill(atlas2, painted2)


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def _diffuse_vertex_colors(colors, colored, edges_src, edges_dst,
                           invalid_idx_mask, max_rounds: int = 512):
    """Grow colors across mesh edges until every vertex is colored, then
    smooth for as many extra rounds as growth took (reference
    unproject.py:162-185 loop semantics)."""
    nv = colors.shape[0]

    def round_step(colors, colored):
        wsum = jax.ops.segment_sum(colors[edges_dst]
                                   * colored[edges_dst, None],
                                   edges_src, num_segments=nv)
        wcnt = jax.ops.segment_sum(colored[edges_dst], edges_src,
                                   num_segments=nv)
        has = wcnt > 0
        newc = wsum / jnp.maximum(wcnt[:, None], 1.0)
        upd = invalid_idx_mask & has
        colors = jnp.where(upd[:, None], newc, colors)
        colored = jnp.where(invalid_idx_mask, jnp.where(has, 1.0, colored),
                            colored)
        return colors, colored

    def cond(state):
        colors, colored, grow_rounds, smooth_left, done = state
        return ~done & (grow_rounds + smooth_left < max_rounds)

    def body(state):
        colors, colored, grow_rounds, smooth_left, done = state
        before = colored.sum()
        colors, colored = round_step(colors, colored)
        grew = colored.sum() > before
        grow_rounds = grow_rounds + jnp.where(grew, 1, 0)
        smooth_left = jnp.where(grew, grow_rounds,
                                jnp.maximum(smooth_left - 1, 0))
        done = ~grew & (smooth_left <= 0)
        return colors, colored, grow_rounds, smooth_left, done

    state = (colors, colored, jnp.int32(0), jnp.int32(0), jnp.bool_(False))
    colors, colored, *_ = jax.lax.while_loop(cond, body, state)
    return colors, colored


def complete_by_neighbors(
    vertices: np.ndarray,
    faces: np.ndarray,
    uvs: np.ndarray,
    face_uv_idx: np.ndarray,
    atlas_img: jnp.ndarray,      # [R,R,3]
    atlas_painted: jnp.ndarray,  # [R,R] bool
    atlas_mask: jnp.ndarray,     # [R,R] bool (covered texels)
    atlas_face_id: jnp.ndarray,  # [R,R] int32
    subdivide_iterations: int = 2,
) -> jnp.ndarray:
    """Paint unseen texels by diffusing vertex colors from seen neighbors
    over the (selectively subdivided) mesh, then nearest-fill the rest.
    Returns the completed [R,R,3] atlas (gutters filled)."""
    R = atlas_img.shape[0]
    # unique unseen-face set computed ON DEVICE: fetching the full [R,R]
    # int32 face-id map (4 MB) + bool mask (1 MB) costs ~0.35 s over the
    # ~14 MB/s tunnel link; the [nf] need-vector is ~10 KB
    nf = len(faces)
    unseen = atlas_mask & ~atlas_painted
    sel = jnp.where(unseen & (atlas_face_id >= 0) & (atlas_face_id < nf),
                    atlas_face_id, nf)
    need = jnp.zeros(nf + 1, jnp.bool_).at[sel.reshape(-1)].set(True)
    to_inpaint = np.nonzero(np.asarray(need[:nf]))[0]

    v, f, uv, fuv = (np.asarray(vertices), np.asarray(faces),
                     np.asarray(uvs), np.asarray(face_uv_idx))
    if len(to_inpaint):
        for _ in range(subdivide_iterations):
            nf_before = len(f)
            v, f, uv, fuv = osub.subdivide_with_uv(v, f, fuv, uv, to_inpaint)
            # newly created faces sit at the tail: keep subdividing them
            n_new = 4 * len(to_inpaint)
            to_inpaint = np.arange(len(f) - n_new, len(f))

    # per-vertex uv: first (vertex, uv) occurrence wins (reference
    # compute_vertex_only_uv_mask picks the unique pair, unproject.py:17-38)
    vert_uv = np.zeros((len(v), 2), np.float32)
    flat_v = f.reshape(-1)
    flat_uv = fuv.reshape(-1)
    # reversed so the first occurrence ends up stored
    vert_uv[flat_v[::-1]] = uv[flat_uv[::-1]]

    # pad vertex/edge arrays to the bucket quantum: post-subdivision
    # counts are unique per shape, and unpadded they would retrace every
    # jitted stage below once per shape.  nv+1 guarantees a pad vertex
    # exists for the edge padding to target.
    nv = len(v)
    nv_pad = _bucket(nv + 1)
    pix = np.clip((vert_uv * R).astype(np.int64), 0, R - 1)
    pix_pad = np.zeros((nv_pad, 2), np.int32)
    pix_pad[:nv] = pix
    valid_np = np.zeros(nv_pad, bool)
    valid_np[:nv] = True
    rows = jnp.asarray(pix_pad[:, 1])
    cols = jnp.asarray(pix_pad[:, 0])
    valid = jnp.asarray(valid_np)

    vert_colors, vert_has = _gather_vertex_colors(
        atlas_img, atlas_painted, rows, cols)
    vert_has = vert_has & valid

    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], 0)
    edges = np.concatenate([edges, edges[:, ::-1]], 0)
    ne_pad = _bucket(len(edges))
    # pad edges self-loop on a pad vertex: colored stays 0 there, so
    # they contribute nothing to any segment sum
    edges_pad = np.full((ne_pad, 2), nv, edges.dtype)
    edges_pad[:len(edges)] = edges
    src = jnp.asarray(edges_pad[:, 0])
    dst = jnp.asarray(edges_pad[:, 1])

    colors, colored = _diffuse_vertex_colors(
        vert_colors, vert_has.astype(jnp.float32), src, dst,
        invalid_idx_mask=(~vert_has) & valid)

    # write diffused colors back at vertex texels, then nearest-fill the
    # whole atlas = unseen texels between vertices + gutters (reference
    # naive_inpainting nearest at :190-193)
    return _write_back_and_fill(atlas_img, atlas_painted, rows, cols,
                                colors, vert_colors, vert_has, valid)
