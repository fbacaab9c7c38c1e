"""Stage: densify sparse view images (inpainting dispatch).

Reference: get_inpainted_images (ours_utils.py:884-951) dispatching to
DDNM diffusion (per view, sequentially!) or scipy griddata linear/nearest.

TPU re-design: all V views are inpainted in ONE batch —
  'nearest'      -> jump-flood fill (ops.image.nearest_fill), vmapped
  'linear'       -> pull-push interpolation, vmapped
  'DDNM_inpaint' -> models.diffusion DDNM sampler, all views in one
                    scanned denoising loop (replaces 800 sequential UNet
                    calls with 100 batched steps; diffusion.py:459-570)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import image as oimg


@jax.jit
def inpaint_nearest(sparse_imgs: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    """sparse_imgs [V,res,res,3]; mask2 [V,res,res] (1 = known)."""
    return jax.vmap(lambda im, m: oimg.nearest_fill(im, m > 0.5))(
        sparse_imgs, mask2)


@jax.jit
def inpaint_linear(sparse_imgs: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    return jax.vmap(lambda im, m: oimg.pullpush_fill(im, m > 0.5))(
        sparse_imgs, mask2)


def get_inpainted_images(sparse_imgs, mask0, mask2, method: str = "nearest",
                         inpainter=None, rng_key=None):
    """Dispatch (reference ours_utils.py:884-951). Returns [V,res,res,3]."""
    if method == "nearest":
        return inpaint_nearest(sparse_imgs, mask2)
    if method == "linear":
        return inpaint_linear(sparse_imgs, mask2)
    if method == "DDNM_inpaint":
        if inpainter is None:
            raise ValueError(
                "DDNM_inpaint requires a models.diffusion.DDNMInpainter "
                "(no diffusion checkpoint configured)")
        return inpainter.inpaint(sparse_imgs, mask2, rng_key=rng_key)
    raise ValueError(f"unknown texture_gen_method {method}")
