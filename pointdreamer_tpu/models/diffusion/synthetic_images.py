"""Synthetic image family for self-contained DDNM training/proof.

The reference's inpainting quality rides on the unshipped
256x256_diffusion_uncond.pt (guided_diffusion/diffusion.py:435-457).
This module provides an analytically-sampled image distribution —
smooth two-color gradients + soft-edged circles + optional stripes —
rich enough that a nearest/pull-push fill visibly underperforms a
learned prior, yet narrow enough that a small DDPM learns it in minutes.

Generation is pure jnp from a PRNG key, so training can synthesize every
batch ON DEVICE inside the scanned epoch (models/diffusion/train.py):
zero host->device data traffic — the TPU-native replacement for the
reference's ImageNet loader (models/DDNM/datasets/__init__.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

N_CIRCLES = 3


def sample_images(key: jnp.ndarray, batch: int, res: int = 32
                  ) -> jnp.ndarray:
    """[B, res, res, 3] in [0, 1]."""
    ks = jax.random.split(key, 10)
    yy, xx = jnp.meshgrid(jnp.linspace(0.0, 1.0, res),
                          jnp.linspace(0.0, 1.0, res), indexing="ij")
    pos = jnp.stack([xx, yy], -1)                        # [R,R,2]

    # base: linear gradient between two random colors, random direction
    c0 = jax.random.uniform(ks[0], (batch, 1, 1, 3))
    c1 = jax.random.uniform(ks[1], (batch, 1, 1, 3))
    ang = jax.random.uniform(ks[2], (batch,), minval=0.0,
                             maxval=2.0 * jnp.pi)
    d = jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)      # [B,2]
    t = jnp.einsum("rcx,bx->brc", pos, d)
    t = (t - t.min(axis=(1, 2), keepdims=True)) / (
        t.max(axis=(1, 2), keepdims=True)
        - t.min(axis=(1, 2), keepdims=True) + 1e-6)
    img = c0 + (c1 - c0) * t[..., None]                  # [B,R,R,3]

    # stripes: sinusoidal blend toward a third color, random weight
    f = jax.random.uniform(ks[3], (batch, 1, 1), minval=1.0, maxval=4.0)
    ph = jax.random.uniform(ks[4], (batch, 1, 1), minval=0.0,
                            maxval=2.0 * jnp.pi)
    sc = jax.random.uniform(ks[5], (batch, 1, 1, 3))
    w = jax.random.uniform(ks[6], (batch, 1, 1, 1), minval=0.0, maxval=0.45)
    s = 0.5 + 0.5 * jnp.sin(2.0 * jnp.pi * f * t + ph)
    img = img * (1 - w * s[..., None]) + sc * (w * s[..., None])

    # soft-edged circles
    ctr = jax.random.uniform(ks[7], (batch, N_CIRCLES, 2),
                             minval=0.15, maxval=0.85)
    rad = jax.random.uniform(ks[8], (batch, N_CIRCLES),
                             minval=0.08, maxval=0.25)
    col = jax.random.uniform(ks[9], (batch, N_CIRCLES, 3))
    for i in range(N_CIRCLES):
        dist = jnp.linalg.norm(pos[None] - ctr[:, None, None, i], axis=-1)
        m = jax.nn.sigmoid((rad[:, None, None, i] - dist) * 60.0)[..., None]
        img = img * (1 - m) + col[:, None, None, i] * m

    return jnp.clip(img, 0.0, 1.0)
