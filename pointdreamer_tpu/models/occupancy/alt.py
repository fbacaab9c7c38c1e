"""Alternative POCO decoders and the PointNet backbone, config-selectable.

Reference: networks/decoder/{interp_attention,interp_mean,interp_max,
interp_inv_dist,interp_mean_prefix,interp_inv_dist_prefix}.py and
networks/backbone/pointnet.py — selectable via the reference's
network_decoder / network_backbone config keys (generate.py:304-305).

All decoders share the same wrapper contract as
fkaconv.decoder_forward: (params, latents [N,L], pos [N,3],
queries [Q,3], proj_indices [Q,K]) -> logits [Q,out].  Torch Conv1d /
Conv2d 1x1 weights convert to the same {weight [O,I], bias [O]} dicts
linear1x1 consumes (see convert_decoder_state_dict).
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .fkaconv import decoder_forward, linear1x1


def _gather(latents, pos, queries, proj_indices):
    xg = latents[proj_indices]                     # [Q,K,L]
    rel = queries[:, None, :] - pos[proj_indices]  # [Q,K,3]
    return xg, rel


def _mlp_stack(p, h):
    """fc_in -> (relu -> mlp_i)* — the shared trunk of the interp_*
    decoders (interp_mean.py:22-26: fc_in + 2 mlp_layers)."""
    h = linear1x1(p["fc_in"], h)
    h = linear1x1(p["mlp_0"], jax.nn.relu(h))
    h = linear1x1(p["mlp_1"], jax.nn.relu(h))
    return h


def decoder_interp_mean(p, latents, pos, queries, proj_indices):
    """InterpMeanNet (interp_mean.py:110-121): per-neighbor MLP, mean
    pool over K, then fc_out."""
    xg, rel = _gather(latents, pos, queries, proj_indices)
    h = _mlp_stack(p, jnp.concatenate([xg, rel], axis=-1))
    return linear1x1(p["fc_out"], h.mean(axis=1))


def decoder_interp_max(p, latents, pos, queries, proj_indices):
    """InterpMaxNet (interp_max.py:89-94): max pool over K."""
    xg, rel = _gather(latents, pos, queries, proj_indices)
    h = _mlp_stack(p, jnp.concatenate([xg, rel], axis=-1))
    return linear1x1(p["fc_out"], h.max(axis=1))


def decoder_interp_inv_dist(p, latents, pos, queries, proj_indices):
    """InterpInvDistNet (interp_inv_dist.py:89-98): inverse-distance
    weighted pool over K (distances clamped at 1e-7)."""
    xg, rel = _gather(latents, pos, queries, proj_indices)
    h = _mlp_stack(p, jnp.concatenate([xg, rel], axis=-1))
    w = 1.0 / jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-7)  # [Q,K]
    agg = (h * w[..., None]).sum(axis=1) / w.sum(axis=1)[:, None]
    return linear1x1(p["fc_out"], agg)


def decoder_interp_mean_prefix(p, latents, pos, queries, proj_indices):
    """InterpMeanPrefixNet (interp_mean_prefix.py:88-97): pool latents
    and rel-pos over K FIRST, then the MLP."""
    xg, rel = _gather(latents, pos, queries, proj_indices)
    h = jnp.concatenate([xg.mean(axis=1), rel.mean(axis=1)], axis=-1)
    return linear1x1(p["fc_out"], _mlp_stack(p, h))


def decoder_interp_inv_dist_prefix(p, latents, pos, queries, proj_indices):
    """InterpInvDistPrefixNet (interp_inv_dist_prefix.py:88-100):
    inverse-distance pool first, then the MLP."""
    xg, rel = _gather(latents, pos, queries, proj_indices)
    w = 1.0 / jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-7)
    wn = (w / w.sum(axis=1, keepdims=True))[..., None]
    h = jnp.concatenate([(xg * wn).sum(axis=1), (rel * wn).sum(axis=1)],
                        axis=-1)
    return linear1x1(p["fc_out"], _mlp_stack(p, h))


def decoder_interp_attention(p, latents, pos, queries, proj_indices):
    """InterpAttentionNet, the single-head variant
    (interp_attention.py:68-98): 3-layer MLP, scalar query logits
    softmaxed over K, attention-weighted sum of values."""
    xg, rel = _gather(latents, pos, queries, proj_indices)
    h = jnp.concatenate([xg, rel], axis=-1)
    h = jax.nn.relu(linear1x1(p["fc1"], h))
    h = jax.nn.relu(linear1x1(p["fc2"], h))
    h = jax.nn.relu(linear1x1(p["fc3"], h))
    query = linear1x1(p["fc_query"], h)[..., 0]     # [Q,K]
    attn = jax.nn.softmax(query, axis=-1)
    value = linear1x1(p["fc_value"], h)             # [Q,K,L]
    agg = jnp.einsum("qk,qkl->ql", attn, value,
                     preferred_element_type=jnp.float32)
    return linear1x1(p["fc8"], agg)


DECODERS = {
    "InterpAttentionKHeadsNet": decoder_forward,    # fkaconv.py default
    "InterpAttentionNet": decoder_interp_attention,
    "InterpMeanNet": decoder_interp_mean,
    "InterpMaxNet": decoder_interp_max,
    "InterpInvDistNet": decoder_interp_inv_dist,
    "InterpMeanPrefixNet": decoder_interp_mean_prefix,
    "InterpInvDistPrefixNet": decoder_interp_inv_dist_prefix,
}


# --------------------------------------------------------------------------
# PointNet backbone (networks/backbone/pointnet.py)
# --------------------------------------------------------------------------

def pointnet_forward(p: Dict, x, spatial: Dict, train: bool = False,
                     stats=None) -> jnp.ndarray:
    """PointNet segmentation backbone (pointnet.py:32-66,
    segmentation=True as POCO uses it): fc_in, then 3 rounds of
    (relu -> conv -> concat global max), fc_3, final concat + fc_out.
    x [N,C] features, spatial['pos'] [N,3] -> per-point latents [N, out].
    """
    pos = spatial["pos"]
    h = linear1x1(p["fc_in"], jnp.concatenate([x, pos], axis=-1))
    for i in range(3):
        h = linear1x1(p[f"mlp_{i}"], jax.nn.relu(h))
        g = h.max(axis=0, keepdims=True)
        h = jnp.concatenate([h, jnp.broadcast_to(g, h.shape)], axis=-1)
    h = linear1x1(p["fc_3"], jax.nn.relu(h))
    g = h.max(axis=0, keepdims=True)
    h = jnp.concatenate([h, jnp.broadcast_to(g, h.shape)], axis=-1)
    return linear1x1(p["fc_out"], h)


# --------------------------------------------------------------------------
# torch state-dict converters + random init
# --------------------------------------------------------------------------

def _conv_entry(sd, name):
    w = np.asarray(sd[name + ".weight"].detach().cpu().numpy()
                   if hasattr(sd[name + ".weight"], "detach")
                   else sd[name + ".weight"])
    w = w.reshape(w.shape[0], w.shape[1])      # Conv1d/2d 1x1 -> [O, I]
    b = np.asarray(sd[name + ".bias"].detach().cpu().numpy()
                   if hasattr(sd[name + ".bias"], "detach")
                   else sd[name + ".bias"])
    return {"weight": w.astype(np.float32), "bias": b.astype(np.float32)}


def convert_decoder_state_dict(sd: Dict, decoder: str) -> Dict:
    """Torch decoder state dict -> our param dict (keys per decoder)."""
    if decoder in ("InterpAttentionNet",):
        return {k: _conv_entry(sd, k)
                for k in ["fc1", "fc2", "fc3", "fc_query", "fc_value",
                          "fc8"]}
    p = {"fc_in": _conv_entry(sd, "fc_in"),
         "fc_out": _conv_entry(sd, "fc_out")}
    for i in range(2):
        p[f"mlp_{i}"] = _conv_entry(sd, f"mlp_layers.{i}")
    return p


def convert_pointnet_state_dict(sd: Dict) -> Dict:
    p = {"fc_in": _conv_entry(sd, "fc_in"),
         "fc_3": _conv_entry(sd, "fc_3"),
         "fc_out": _conv_entry(sd, "fc_out")}
    for i in range(3):
        p[f"mlp_{i}"] = _conv_entry(sd, f"mlp_layers.{i}")
    return p


def _rand_lin(rng, o, i):
    b = 1.0 / math.sqrt(i)
    return {"weight": rng.uniform(-b, b, (o, i)).astype(np.float32),
            "bias": rng.uniform(-b, b, (o,)).astype(np.float32)}


def init_alt_decoder_params(decoder: str, seed: int = 0, latent: int = 32,
                            n_labels: int = 2) -> Dict:
    rng = np.random.default_rng(seed)
    if decoder == "InterpAttentionNet":
        return {"fc1": _rand_lin(rng, latent, latent + 3),
                "fc2": _rand_lin(rng, latent, latent),
                "fc3": _rand_lin(rng, latent, latent),
                "fc_query": _rand_lin(rng, 1, latent),
                "fc_value": _rand_lin(rng, latent, latent),
                "fc8": _rand_lin(rng, n_labels, latent)}
    return {"fc_in": _rand_lin(rng, latent, latent + 3),
            "mlp_0": _rand_lin(rng, latent, latent),
            "mlp_1": _rand_lin(rng, latent, latent),
            "fc_out": _rand_lin(rng, n_labels, latent)}


def init_pointnet_params(seed: int = 0, in_channels: int = 3,
                         out_channels: int = 32,
                         hidden: int = 128) -> Dict:
    rng = np.random.default_rng(seed)
    return {"fc_in": _rand_lin(rng, 2 * hidden, in_channels + 3),
            "mlp_0": _rand_lin(rng, hidden, 2 * hidden),
            "mlp_1": _rand_lin(rng, hidden, 2 * hidden),
            "mlp_2": _rand_lin(rng, hidden, 2 * hidden),
            "fc_3": _rand_lin(rng, hidden, 2 * hidden),
            "fc_out": _rand_lin(rng, out_channels, 2 * hidden)}
