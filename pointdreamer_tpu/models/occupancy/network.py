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


def encode_latents_chunked(params, points: jnp.ndarray,
                           chunk: int = 100_000, cover: int = 3,
                           rng: Optional[np.random.Generator] = None
                           ) -> jnp.ndarray:
    """Big-cloud latent path (generate_1.py:119-156): for clouds too
    large to encode at once, repeatedly pick a least-covered seed point,
    take its `chunk` nearest neighbors (a spatially coherent patch, not a
    random subset), encode that patch, and accumulate until every point
    is covered `cover` times (the reference's n_views=3).

    TPU shape: the seed's neighborhood comes from one [N] distance
    argsort; the patch encode reuses the fixed-shape `_encode_subset`
    through the quantized sampler's FPS pyramid.  Deterministic seed
    choice (first argmin of counts) replaces the reference's random pick.
    """
    n = points.shape[0]
    rng = rng or np.random.default_rng(42)
    pts_np = np.asarray(points)
    counts = np.zeros((n,), np.int32)
    latent_sum = None

    while counts.min() < cover:
        seed = int(np.flatnonzero(counts == counts.min())[0])
        d2 = ((pts_np - pts_np[seed]) ** 2).sum(-1)
        neigh = np.argpartition(d2, min(chunk, n) - 1)[:chunk]
        sub = jnp.asarray(pts_np[neigh])
        lat = _encode_subset(params, sub)
        if latent_sum is None:
            latent_sum = np.zeros((n, lat.shape[-1]), np.float32)
        latent_sum[neigh] += np.asarray(lat)
        counts[neigh] += 1
    return jnp.asarray(latent_sum / counts[:, None])


def autoscale_factor(points: np.ndarray,
                     target: float = 0.01) -> float:
    """Reference gen_autoscale (generate_1.py:101-110): scale so the mean
    nearest-neighbor distance matches `target` (0.01, estimated on
    shapenet-3000)."""
    pts = jnp.asarray(points)
    d, _ = knn(pts, pts, 2)
    mean_dist = float(jnp.sqrt(jnp.maximum(d[:, 1], 0.0)).mean())
    return target / max(mean_dist, 1e-12)


@functools.partial(jax.jit, static_argnames=("k", "decoder"))
def query_occupancy(params, latents, points, queries, k: int = 64,
                    decoder: str = "InterpAttentionKHeadsNet"):
    """Signed occupancy field at query positions (negative inside).
    `decoder` selects among the reference's network_decoder variants
    (generate.py:305; registry in alt.DECODERS)."""
    from .alt import DECODERS

    _, proj = knn(queries, points, k)
    logits = DECODERS[decoder](params["projection"], latents, points,
                               queries, proj)
    return occupancy_field(logits)


def make_poco_field(params, points: jnp.ndarray, noise_std: float = 0.005,
                    rng: Optional[np.random.Generator] = None,
                    decoder: str = "InterpAttentionKHeadsNet",
                    subsample: Optional[int] = 3000,
                    big_threshold: int = 100_000):
    """Returns fn [M,3]->[M] for pipeline.geometry (geo_from='POCO').

    Adds sigma=0.005 noise to clean inputs like the reference
    (generate_1.py:71-72), encodes latents once, then closes over them.
    With subsample=None and a cloud above `big_threshold` points, uses the
    reference's chunked-neighborhood latent path (generate_1.py:119-156).
    """
    rng = rng or np.random.default_rng(42)
    pts = jnp.asarray(points)
    if noise_std:
        pts = pts + jnp.asarray(
            rng.normal(0, noise_std, pts.shape), jnp.float32)
    if subsample is None and pts.shape[0] > big_threshold:
        latents = encode_latents_chunked(params, pts, rng=rng)
    else:
        latents = encode_latents(params, pts,
                                 subsample=subsample or 3000, rng=rng)

    def field(queries):
        return query_occupancy(params, latents, pts, queries,
                               decoder=decoder)

    return field
