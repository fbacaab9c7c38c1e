"""Convert the OpenAI guided-diffusion torch checkpoint
(256x256_diffusion_uncond.pt, auto-downloaded by the reference at
diffusion.py:447-451) into the flax UNet param tree.

Key mapping is mechanical because unet.unet_plan replays the exact torch
constructor order (unet.py:470-607): torch `input_blocks.{i}.{j}.*` maps
to flax `input_{i}_{j}` modules.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .unet import unet_plan


def _conv(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"], np.float32)  # [O,I,kh,kw]
    b = np.asarray(sd[prefix + ".bias"], np.float32)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def _conv1d_as_dense(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"], np.float32)  # [O,I,1]
    b = np.asarray(sd[prefix + ".bias"], np.float32)
    return {"kernel": w[:, :, 0].T, "bias": b}


def _dense(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"], np.float32)  # [O,I]
    b = np.asarray(sd[prefix + ".bias"], np.float32)
    return {"kernel": w.T, "bias": b}


def _norm(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
            "bias": np.asarray(sd[prefix + ".bias"], np.float32)}


def _resblock(sd, prefix):
    out = {
        "in_norm": _norm(sd, prefix + ".in_layers.0"),
        "in_conv": _conv(sd, prefix + ".in_layers.2"),
        "emb": _dense(sd, prefix + ".emb_layers.1"),
        "out_norm": _norm(sd, prefix + ".out_layers.0"),
        "out_conv": _conv(sd, prefix + ".out_layers.3"),
    }
    if prefix + ".skip_connection.weight" in sd:
        out["skip"] = _conv(sd, prefix + ".skip_connection")
    return out


def _attention(sd, prefix):
    return {
        "norm": _norm(sd, prefix + ".norm"),
        "qkv": _conv1d_as_dense(sd, prefix + ".qkv"),
        "proj": _conv1d_as_dense(sd, prefix + ".proj_out"),
    }


def convert_torch_state_dict(sd: Dict[str, "np.ndarray"],
                             model_channels=256, num_res_blocks=2,
                             channel_mult=(1, 1, 2, 2, 4, 4),
                             attention_ds=(8, 16, 32)) -> Dict:
    """sd: torch state_dict with tensors convertible via np.asarray
    (load with torch.load(..., map_location='cpu') and pass
    {k: v.numpy() for k, v in sd.items()})."""
    input_plan, middle_plan, output_plan = unet_plan(
        model_channels, num_res_blocks, channel_mult, attention_ds)
    params = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "out_norm": _norm(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
    }

    def map_layer(kind, tprefix):
        if kind == "conv":
            return _conv(sd, tprefix)
        if kind == "res":
            return _resblock(sd, tprefix)
        if kind == "attn":
            return _attention(sd, tprefix)
        if kind == "down":
            return {"conv": _conv(sd, tprefix + ".op")}
        if kind == "up":
            return {"conv": _conv(sd, tprefix + ".conv")}
        raise ValueError(kind)

    for i, layers in enumerate(input_plan):
        for j, (kind, _, _) in enumerate(layers):
            params[f"input_{i}_{j}"] = map_layer(
                kind, f"input_blocks.{i}.{j}")
    for j, (kind, _, _) in enumerate(middle_plan):
        params[f"middle_{j}"] = map_layer(kind, f"middle_block.{j}")
    for i, layers in enumerate(output_plan):
        for j, (kind, _, _) in enumerate(layers):
            params[f"output_{i}_{j}"] = map_layer(
                kind, f"output_blocks.{i}.{j}")
    return params


def convert_encoder_state_dict(sd: Dict[str, "np.ndarray"],
                               model_channels=128, num_res_blocks=2,
                               channel_mult=(1, 1, 2, 2, 4, 4),
                               attention_ds=(8, 16, 32),
                               pool="attention") -> Dict:
    """Torch EncoderUNetModel state_dict (e.g. the public
    256x256_classifier.pt; reference unet.py:684-850) -> flax
    EncoderUNetModel params.  Encoder/middle blocks share the UNet's
    naming; the head is out.{0:GN, 2:AttentionPool2d|1x1 conv}."""
    input_plan, middle_plan, _ = unet_plan(
        model_channels, num_res_blocks, channel_mult, attention_ds)
    params = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "out_norm": _norm(sd, "out.0"),
    }
    if pool == "attention":
        params["out_pool"] = {
            # torch positional_embedding is [C, HW+1]; ours token-major
            "positional_embedding":
                np.asarray(sd["out.2.positional_embedding"]).T,
            "qkv_proj": _conv1d_as_dense(sd, "out.2.qkv_proj"),
            "c_proj": _conv1d_as_dense(sd, "out.2.c_proj"),
        }
    else:   # adaptive: out.3 is the zero-init 1x1 conv before Flatten
        k = np.asarray(sd["out.3.weight"])          # [out, C, 1, 1]
        params["out_conv"] = {"kernel": k[:, :, 0, 0].T,
                              "bias": np.asarray(sd["out.3.bias"])}

    def map_layer(kind, tprefix):
        if kind == "conv":
            return _conv(sd, tprefix)
        if kind == "res":
            return _resblock(sd, tprefix)
        if kind == "attn":
            return _attention(sd, tprefix)
        if kind == "down":
            return {"conv": _conv(sd, tprefix + ".op")}
        raise ValueError(kind)

    for i, layers in enumerate(input_plan):
        for j, (kind, _, _) in enumerate(layers):
            params[f"input_{i}_{j}"] = map_layer(
                kind, f"input_blocks.{i}.{j}")
    for j, (kind, _, _) in enumerate(middle_plan):
        params[f"middle_{j}"] = map_layer(kind, f"middle_block.{j}")
    return params


def load_torch_checkpoint(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_state_dict(
        {k: v.float().numpy() for k, v in sd.items()})
