"""POCO network wrapper: latent encoding + occupancy queries + geometry.

Reference: networks/network.py Network (get_latent/from_latent split) and
the PointDreamer facade generate_1.py POCO_get_geo (:70-290): per-point
latents averaged over repeated random 3000-point subsets, then chunked
occupancy queries over a grid + marching cubes.

TPU re-design: the subset loop becomes a fixed number of passes over a
random permutation (every point covered exactly `cover` times — the
reference loops "while counts.min() < i+1" with random subsets, same
effect); each pass is the same fixed-shape jitted encode.  The dense-grid
query + marching tetrahedra replace region growing.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .fkaconv import backbone_forward, decoder_forward, occupancy_field
from .spatial import compute_spatial
from ...ops.knn import knn


@functools.partial(jax.jit, static_argnames=())
def _encode_subset(params, sub_pos):
    spatial = compute_spatial(sub_pos)
    x = jnp.ones_like(sub_pos)          # reference generate_1.py:74 x=ones
    return backbone_forward(params["net"], x, spatial, train=False)


def encode_latents(params, points: jnp.ndarray,
                   subsample: int = 3000, cover: int = 10,
                   rng: Optional[np.random.Generator] = None) -> jnp.ndarray:
    """Per-point latents [N, L] averaged over `cover` coverages of random
    3000-point subsets (generate_1.py:191-233, gen_subsample_manifold=3000,
    gen_subsample_manifold_iter=10)."""
    n = points.shape[0]
    rng = rng or np.random.default_rng(42)
    if n <= subsample:
        pad = subsample - n
        idx = np.concatenate([np.arange(n),
                              rng.integers(0, n, pad)]).astype(np.int32)
        lat = _encode_subset(params, points[idx])
        out = jnp.zeros((n, lat.shape[-1]))
        cnt = jnp.zeros((n, 1))
        out = out.at[idx].add(lat)
        cnt = cnt.at[idx].add(1.0)
        return out / cnt

    latent_sum = None
    counts = None
    for _ in range(cover):
        perm = rng.permutation(n)
        n_batches = -(-n // subsample)
        pad = n_batches * subsample - n
        if pad:
            perm = np.concatenate([perm, rng.integers(0, n, pad)])
        for b in range(n_batches):
            idx = perm[b * subsample:(b + 1) * subsample].astype(np.int32)
            lat = _encode_subset(params, points[idx])
            if latent_sum is None:
                latent_sum = jnp.zeros((n, lat.shape[-1]))
                counts = jnp.zeros((n, 1))
            latent_sum = latent_sum.at[idx].add(lat)
            counts = counts.at[idx].add(1.0)
    return latent_sum / counts


@functools.partial(jax.jit, static_argnames=("k",))
def query_occupancy(params, latents, points, queries, k: int = 64):
    """Signed occupancy field at query positions (negative inside)."""
    _, proj = knn(queries, points, k)
    logits = decoder_forward(params["projection"], latents, points,
                             queries, proj)
    return occupancy_field(logits)


def make_poco_field(params, points: jnp.ndarray, noise_std: float = 0.005,
                    rng: Optional[np.random.Generator] = None):
    """Returns fn [M,3]->[M] for pipeline.geometry (geo_from='POCO').

    Adds sigma=0.005 noise to clean inputs like the reference
    (generate_1.py:71-72), encodes latents once, then closes over them.
    """
    rng = rng or np.random.default_rng(42)
    pts = jnp.asarray(points)
    if noise_std:
        pts = pts + jnp.asarray(
            rng.normal(0, noise_std, pts.shape), jnp.float32)
    latents = encode_latents(params, pts, rng=rng)

    def field(queries):
        return query_occupancy(params, latents, pts, queries)

    return field
