"""FKAConv backbone + K-heads attention decoder, functional JAX.

Architecture-exact port of the reference POCO network:
  Convolution_FKAConv      lightconvpoint/nn/conv_fkaconv.py:9-145
  ResidualBlock            networks/backbone/fkaconv_network.py:13-43
  FKAConvNetwork (seg)     networks/backbone/fkaconv_network.py:45-238
  InterpAttentionKHeadsNet networks/decoder/interp_attention_Kheads.py:8-107

Implementation style: pure functions over a nested param dict whose keys
mirror the torch module names 1:1 (net.cv0.*, net.resnetb10.*,
projection.fc1.*, ...), so the checkpoint converter is a mechanical
tensor-layout transpose.  Layout here is [N, C] ("points last-channel"),
turning every 1x1 conv into a plain matmul on the MXU.

`train=False` uses BatchNorm running stats (inference parity with the
torch eval() path); `train=True` uses batch statistics and returns
updated running stats for the training loop.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

EPS_BN = 1e-5
EPS_IN = 1e-5


# --------------------------------------------------------------------------
# primitive layers
# --------------------------------------------------------------------------

def linear1x1(p, x):
    """torch Conv1d/Conv2d with 1x1 kernel == matmul. p: {weight [O,I],
    bias? [O]}; x: [..., I]."""
    y = x @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


def batchnorm(p, x, train: bool):
    """BatchNorm1d over the channel (last) dim; stats over all other dims.
    Returns (y, new_stats) where new_stats is None in eval mode."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = x.mean(axes)
        var = x.var(axes)
        mom = 0.1
        new_stats = (
            (1 - mom) * p["running_mean"] + mom * mean,
            (1 - mom) * p["running_var"] + mom * var,
        )
    else:
        mean, var = p["running_mean"], p["running_var"]
        new_stats = None
    y = (x - mean) * jax.lax.rsqrt(var + EPS_BN)
    return y * p["weight"] + p["bias"], new_stats


def instancenorm_global(p, x):
    """torch InstanceNorm2d on [1, C, M, k] == normalize each channel over
    all (M, k) positions (single shape => single instance)."""
    axes = tuple(i for i in range(x.ndim) if i != x.ndim - 1)
    mean = x.mean(axes, keepdims=True)
    var = x.var(axes, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + EPS_IN)
    return y * p["weight"] + p["bias"]


# --------------------------------------------------------------------------
# FKAConv convolution
# --------------------------------------------------------------------------

def fkaconv(p, x, pos, support, ids, train: bool = False):
    """p: params of one Convolution_FKAConv; x [N,Cin]; pos [N,3];
    support [M,3]; ids [M,k]. Returns [M,Cout].

    reference conv_fkaconv.py:62-145 (adaptive_normalization=True path).
    """
    pts = pos[ids] - support[:, None, :]          # [M,k,3]
    xg = x[ids]                                   # [M,k,Cin]

    distances = jnp.sqrt((pts ** 2).sum(-1))      # [M,k]
    pts = pts / p["norm_radius"]

    dw = jax.nn.sigmoid(-p["alpha"] * distances + p["beta"])
    dws = dw.sum(-1, keepdims=True)
    dws = dws + (dws == 0) + 1e-6
    dw = dw / dws * distances.shape[-1]           # [M,k]

    mat = jax.nn.relu(instancenorm_global(p["bn1"], linear1x1(p["fc1"], pts)))
    mp1 = jnp.broadcast_to((mat * dw[..., None]).max(axis=1, keepdims=True),
                           mat.shape)
    mat = jnp.concatenate([mat, mp1], axis=-1)
    mat = jax.nn.relu(instancenorm_global(p["bn2"], linear1x1(p["fc2"], mat)))
    mp2 = jnp.broadcast_to((mat * dw[..., None]).max(axis=1, keepdims=True),
                           mat.shape)
    mat = jnp.concatenate([mat, mp2], axis=-1)
    mat = jax.nn.relu(linear1x1(p["fc3"], mat)) * dw[..., None]  # [M,k,16]

    # x^T mat then (1,16) conv == double contraction on the MXU
    inner = jnp.einsum("mkc,mkj->mcj", xg, mat,
                       preferred_element_type=jnp.float32)
    return jnp.einsum("mcj,ocj->mo", inner, p["cv"]["weight"],
                      preferred_element_type=jnp.float32)


def max_pool_nbr(x, ids):
    """max over gathered neighbors (lightconvpoint nn/max_pooling.py)."""
    return x[ids].max(axis=1)


def interpolate_nn(x, ids):
    """kNN-mean upsample (lightconvpoint nn/interpolation.py:16-34)."""
    return x[ids].mean(axis=1)


# --------------------------------------------------------------------------
# Residual block / backbone
# --------------------------------------------------------------------------

def residual_block(p, x, pos, support, ids, train=False, stats=None,
                   prefix=""):
    def bn(name, v):
        y, ns = batchnorm(p[name], v, train)
        if train and stats is not None:
            stats[prefix + name] = ns
        return y

    h = jax.nn.relu(bn("bn0", linear1x1(p["cv0"], x)))
    h = jax.nn.relu(bn("bn1", fkaconv(p["cv1"], h, pos, support, ids, train)))
    h = bn("bn2", linear1x1(p["cv2"], h))

    if "shortcut" in p:
        xs = bn("bn_shortcut", linear1x1(p["shortcut"], x))
    else:
        xs = x
    if xs.shape[0] != h.shape[0]:
        xs = max_pool_nbr(xs, ids)
    return jax.nn.relu(h + xs)


def backbone_forward(p, x, spatial, train=False, stats=None):
    """FKAConvNetwork segmentation forward (fkaconv_network.py:177-224).
    p = params['net']; x [N,Cin]; spatial from compute_spatial.
    Returns per-point latents [N, latent]."""
    pos = spatial["pos"]
    s1, s2, s3, s4 = (spatial["support1"], spatial["support2"],
                      spatial["support3"], spatial["support4"])

    def bn(name, v):
        y, ns = batchnorm(p[name], v, train)
        if train and stats is not None:
            stats["net." + name] = ns
        return y

    def res(name, *args):
        return residual_block(p[name], *args, train=train, stats=stats,
                              prefix=f"net.{name}.")

    x0 = jax.nn.relu(bn("bn0", fkaconv(p["cv0"], x, pos, pos,
                                       spatial["ids00"], train)))
    x0 = res("resnetb01", x0, pos, pos, spatial["ids00"])
    x1 = res("resnetb10", x0, pos, s1, spatial["ids01"])
    x1 = res("resnetb11", x1, s1, s1, spatial["ids11"])
    x2 = res("resnetb20", x1, s1, s2, spatial["ids12"])
    x2 = res("resnetb21", x2, s2, s2, spatial["ids22"])
    x3 = res("resnetb30", x2, s2, s3, spatial["ids23"])
    x3 = res("resnetb31", x3, s3, s3, spatial["ids33"])
    x4 = res("resnetb40", x3, s3, s4, spatial["ids34"])
    x4 = res("resnetb41", x4, s4, s4, spatial["ids44"])

    x3d = interpolate_nn(x4, spatial["ids43"])
    x3d = jax.nn.relu(bn("bn3d", linear1x1(
        p["cv3d"], jnp.concatenate([x3d, x3], axis=-1))))
    x2d = interpolate_nn(x3d, spatial["ids32"])
    x2d = jax.nn.relu(bn("bn2d", linear1x1(
        p["cv2d"], jnp.concatenate([x2d, x2], axis=-1))))
    x1d = interpolate_nn(x2d, spatial["ids21"])
    x1d = jax.nn.relu(bn("bn1d", linear1x1(
        p["cv1d"], jnp.concatenate([x1d, x1], axis=-1))))
    xout = interpolate_nn(x1d, spatial["ids10"])
    xout = jax.nn.relu(bn("bn0d", linear1x1(
        p["cv0d"], jnp.concatenate([xout, x0], axis=-1))))
    return linear1x1(p["fcout"], xout)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def decoder_forward(p, latents, pos, queries, proj_indices):
    """InterpAttentionKHeadsNet (interp_attention_Kheads.py:59-107).
    p = params['projection']; latents [N,L]; queries [Q,3];
    proj_indices [Q,K]. Returns logits [Q, out]."""
    xg = latents[proj_indices]                     # [Q,K,L]
    rel = queries[:, None, :] - pos[proj_indices]  # [Q,K,3]
    h = jnp.concatenate([xg, rel], axis=-1)
    h = jax.nn.relu(linear1x1(p["fc1"], h))
    h = jax.nn.relu(linear1x1(p["fc2"], h))
    h = jax.nn.relu(linear1x1(p["fc3"], h))
    query = linear1x1(p["fc_query"], h)            # [Q,K,64]
    value = linear1x1(p["fc_value"], h)            # [Q,K,L]
    attn = jax.nn.softmax(query, axis=1).mean(axis=-1)   # [Q,K]
    agg = jnp.einsum("qk,qkl->ql", attn, value,
                     preferred_element_type=jnp.float32)
    return linear1x1(p["fc8"], agg)


def occupancy_field(logits):
    """2-class logits -> signed scalar field, negative inside
    (reference generate.py:100-109 with class_dim=1)."""
    z = jax.nn.softmax(jnp.stack([logits[:, 1], logits[:, 0]], axis=1),
                       axis=1)
    return z[:, 1] - z[:, 0]        # p(out) - p(in)
