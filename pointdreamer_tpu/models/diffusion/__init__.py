"""Diffusion inpainting model family (DDNM over the guided-diffusion UNet).

Reference: models/DDNM (ddnm_inpainting.py Inpainter + guided_diffusion).
"""
from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from .ddnm import DDNMInpainter, ddnm_inpaint_batch, get_schedule_jump
from .unet import (AttentionPool2d, EncoderUNetModel, SuperResModel,
                   UNetModel, imagenet256_unet, timestep_embedding)


def init_unet_params(model: UNetModel, rng_key=None, image_size: int = 256):
    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, image_size, image_size, 3)),
                           jnp.zeros((1,)))
    return variables["params"]


def load_inpainter(checkpoint_path=None, logger=None,
                   t_sampling: int = 100, eta: float = 0.85,
                   seed: int = 1234, model_kwargs=None,
                   mesh=None, quant_int8: bool = False,
                   quant_static: bool = True) -> DDNMInpainter:
    """Build the DDNM inpainter (reference prepare(), demo.py:322-328).

    With a checkpoint path, torch weights are converted; without one the
    UNet is randomly initialized (the reference downloads
    256x256_diffusion_uncond.pt — not available offline), which exercises
    the full compute path but produces noise-quality textures: use
    texture_gen_method 'nearest'/'linear' when no checkpoint exists.
    """
    model = (UNetModel(**model_kwargs) if model_kwargs
             else imagenet256_unet(quant=quant_int8))
    if checkpoint_path:
        from .convert import load_torch_checkpoint

        if logger:
            logger.info(f"Loading diffusion checkpoint {checkpoint_path}")
        params = load_torch_checkpoint(checkpoint_path)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        warnings.warn("no diffusion checkpoint: UNet is randomly "
                      "initialized; textures from DDNM_inpaint will be "
                      "meaningless (use nearest/linear instead)")
        # param shapes are image-size independent; init small & fast.
        # (A host-side numpy fill would be cheaper to trace but pushes
        # ~2.2 GB through the ~14 MB/s device tunnel; flax init stays
        # on-device.)
        init_size = 16 * 2 ** (len(model.channel_mult) - 1)
        fp_model = (model.clone(quant=False) if quant_int8 else model)
        params = init_unet_params(fp_model, image_size=init_size)
    static_calib = False
    if quant_int8:
        from .unet import quantize_unet_params

        if logger:
            logger.info("quantizing UNet torso to w8a8 (int8 MXU)")
        params = quantize_unet_params(params)
        # static per-step activation scales, calibrated on the first
        # inpaint call (removes the per-conv abs-max reduction pass);
        # False keeps the dynamic per-call scales
        static_calib = quant_static
    return DDNMInpainter(model, params, t_sampling, eta, seed, mesh=mesh,
                         static_calib=static_calib)
