"""Alternative occupancy backbones/decoders (config-selectable parity).

Reference: networks/backbone/pointnet.py (PointNet backbone, unused by
the demo) and networks/decoder/{interp_mean,interp_max,interp_inv_dist}.py
(alternative decoders selectable via config, SURVEY §2.2).
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .fkaconv import linear1x1


# --------------------------------------------------------------------------
# PointNet backbone (per-point latents via global + local features)
# --------------------------------------------------------------------------

def init_pointnet_params(seed: int = 0, latent: int = 32,
                         hidden: int = 128) -> Dict:
    rng = np.random.default_rng(seed)

    def lin(o, i):
        b = 1.0 / math.sqrt(i)
        return {"weight": rng.uniform(-b, b, (o, i)).astype(np.float32),
                "bias": rng.uniform(-b, b, (o,)).astype(np.float32)}

    return {
        "fc1": lin(hidden, 3), "fc2": lin(hidden, hidden),
        "fc3": lin(hidden, hidden),
        "fc_global": lin(hidden, hidden),
        "fc_out1": lin(hidden, 2 * hidden), "fc_out2": lin(latent, hidden),
    }


def pointnet_forward(p: Dict, x_unused, spatial: Dict,
                     train: bool = False, stats=None) -> jnp.ndarray:
    """pos [N,3] -> latents [N, latent] (reference pointnet.py)."""
    pos = spatial["pos"]
    h = jax.nn.relu(linear1x1(p["fc1"], pos))
    h = jax.nn.relu(linear1x1(p["fc2"], h))
    h = jax.nn.relu(linear1x1(p["fc3"], h))
    g = jax.nn.relu(linear1x1(p["fc_global"], h)).max(axis=0, keepdims=True)
    hg = jnp.concatenate([h, jnp.broadcast_to(g, h.shape)], axis=-1)
    h = jax.nn.relu(linear1x1(p["fc_out1"], hg))
    return linear1x1(p["fc_out2"], h)


# --------------------------------------------------------------------------
# alternative decoders (same call signature as fkaconv.decoder_forward)
# --------------------------------------------------------------------------

def decoder_interp_mean(p, latents, pos, queries, proj_indices):
    """Mean-pool neighbor features (+rel pos MLP) — interp_mean.py."""
    xg = latents[proj_indices]
    rel = queries[:, None, :] - pos[proj_indices]
    h = jnp.concatenate([xg, rel], axis=-1)
    h = jax.nn.relu(linear1x1(p["fc1"], h))
    h = jax.nn.relu(linear1x1(p["fc2"], h))
    h = h.mean(axis=1)
    return linear1x1(p["fc8"], h)


def decoder_interp_max(p, latents, pos, queries, proj_indices):
    """Max-pool variant — interp_max.py."""
    xg = latents[proj_indices]
    rel = queries[:, None, :] - pos[proj_indices]
    h = jnp.concatenate([xg, rel], axis=-1)
    h = jax.nn.relu(linear1x1(p["fc1"], h))
    h = jax.nn.relu(linear1x1(p["fc2"], h))
    h = h.max(axis=1)
    return linear1x1(p["fc8"], h)


def decoder_interp_inv_dist(p, latents, pos, queries, proj_indices):
    """Inverse-distance-weighted pooling — interp_inv_dist.py."""
    xg = latents[proj_indices]
    rel = queries[:, None, :] - pos[proj_indices]
    w = 1.0 / (jnp.linalg.norm(rel, axis=-1) + 1e-6)
    w = w / w.sum(axis=1, keepdims=True)
    h = jnp.concatenate([xg, rel], axis=-1)
    h = jax.nn.relu(linear1x1(p["fc1"], h))
    h = jax.nn.relu(linear1x1(p["fc2"], h))
    h = (h * w[..., None]).sum(axis=1)
    return linear1x1(p["fc8"], h)


def init_alt_decoder_params(seed: int = 0, latent: int = 32,
                            n_labels: int = 2) -> Dict:
    rng = np.random.default_rng(seed)

    def lin(o, i):
        b = 1.0 / math.sqrt(i)
        return {"weight": rng.uniform(-b, b, (o, i)).astype(np.float32),
                "bias": rng.uniform(-b, b, (o,)).astype(np.float32)}

    return {"fc1": lin(latent, latent + 3), "fc2": lin(latent, latent),
            "fc8": lin(n_labels, latent)}


def decoder_interp_mean_prefix(p, latents, pos, queries, proj_indices):
    """Pool-first variant: mean latents + mean rel-pos, then MLP
    (reference interp_mean_prefix.py:60-97)."""
    xg = latents[proj_indices].mean(axis=1)
    rel = (queries[:, None, :] - pos[proj_indices]).mean(axis=1)
    h = linear1x1(p["fc_in"], jnp.concatenate([xg, rel], axis=-1))
    h = linear1x1(p["mlp_0"], jax.nn.relu(h))
    h = linear1x1(p["mlp_1"], jax.nn.relu(h))
    return linear1x1(p["fc_out"], h)


def decoder_interp_inv_dist_prefix(p, latents, pos, queries, proj_indices):
    """Pool-first with inverse-distance weights
    (reference interp_inv_dist_prefix.py)."""
    rel = queries[:, None, :] - pos[proj_indices]
    w = 1.0 / (jnp.linalg.norm(rel, axis=-1) + 1e-6)
    w = (w / w.sum(axis=1, keepdims=True))[..., None]
    xg = (latents[proj_indices] * w).sum(axis=1)
    relm = (rel * w).sum(axis=1)
    h = linear1x1(p["fc_in"], jnp.concatenate([xg, relm], axis=-1))
    h = linear1x1(p["mlp_0"], jax.nn.relu(h))
    h = linear1x1(p["mlp_1"], jax.nn.relu(h))
    return linear1x1(p["fc_out"], h)


def init_prefix_decoder_params(seed: int = 0, latent: int = 32,
                               n_labels: int = 2) -> Dict:
    rng = np.random.default_rng(seed)

    def lin(o, i):
        b = 1.0 / math.sqrt(i)
        return {"weight": rng.uniform(-b, b, (o, i)).astype(np.float32),
                "bias": rng.uniform(-b, b, (o,)).astype(np.float32)}

    return {"fc_in": lin(latent, latent + 3), "mlp_0": lin(latent, latent),
            "mlp_1": lin(latent, latent), "fc_out": lin(n_labels, latent)}


DECODERS = {
    "InterpAttentionKHeadsNet": None,  # fkaconv.decoder_forward (default)
    "InterpMeanNet": decoder_interp_mean,
    "InterpMaxNet": decoder_interp_max,
    "InterpInvDistNet": decoder_interp_inv_dist,
    "InterpMeanPrefixNet": decoder_interp_mean_prefix,
    "InterpInvDistPrefixNet": decoder_interp_inv_dist_prefix,
}
