"""Spatial precomputation for the occupancy network: point-pyramid
subsampling + kNN graphs.

Reference: FKAConvNetwork.forward_spatial (fkaconv_network.py:92-174)
computes 4 levels of quantized-voxel subsampling (sampling_quantized.py:10,
random rotations + torch_geometric voxel clustering, CPU python loops) and
13 scipy-KDTree kNN calls (knn.py:4-22).

TPU re-design: deterministic farthest-point sampling (a lax.scan of
distance updates — higher-quality supports than random voxel picks and
reproducible), and brute-force matmul kNN (ops.knn).  All fixed shapes:
level sizes are ceil(N * 0.25^l).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.knn import knn


@functools.partial(jax.jit, static_argnames=("n_support",))
def farthest_point_sampling(points: jnp.ndarray, n_support: int) -> jnp.ndarray:
    """[N,3] -> indices [n_support] by FPS (seeded at point 0)."""
    n = points.shape[0]

    def body(carry, _):
        mind, last = carry
        d = ((points - points[last]) ** 2).sum(-1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind)
        return (mind, nxt), last

    (_, _), idx = jax.lax.scan(
        body, (jnp.full((n,), jnp.inf), jnp.int32(0)), None,
        length=n_support)
    return idx


def quantized_sampling(points, n_support: int, seed: int = 0):
    """Host-side port of the reference's quantized-voxel sampling
    (lightconvpoint sampling_quantized.py:10-75): random rotation, voxel
    clustering at size bbox_diag/sqrt(n), one point per occupied voxel,
    repeated on the remainder until n_support points are picked.  Used by
    tests to demonstrate occupancy-output equivalence with the FPS
    default (SURVEY §7 hard-part 6); FPS stays the production sampler
    (deterministic, fixed-shape, device-side)."""
    import numpy as np

    pts_all = np.asarray(points)
    n = pts_all.shape[0]
    if n_support >= n:
        return jnp.arange(n, dtype=jnp.int32)
    rng = np.random.default_rng(seed)
    diag = np.linalg.norm(pts_all.max(0) - pts_all.min(0))
    vox = diag / np.sqrt(n_support)
    ids = np.arange(n)
    pts = pts_all
    sampled = []
    count = 0
    while True:
        angs = rng.uniform(-np.pi, np.pi, 3)
        rots = []
        for ax, a in enumerate(angs):
            c, s = np.cos(a), np.sin(a)
            m = np.eye(3)
            i, j = [(1, 2), (0, 2), (0, 1)][ax]
            m[i, i] = c; m[i, j] = -s; m[j, i] = s; m[j, j] = c
            rots.append(m)
        r = rots[2] @ rots[1] @ rots[0]
        rp = pts @ r.T
        keys = np.floor((rp - rp.min(0)) / vox).astype(np.int64)
        flat = (keys[:, 0] * 73856093 ^ keys[:, 1] * 19349663
                ^ keys[:, 2] * 83492791)
        _, perm = np.unique(flat, return_index=True)
        if count + len(perm) < n_support:
            sampled.append(ids[perm])
            count += len(perm)
            keep = np.ones(len(ids), bool)
            keep[perm] = False
            ids = ids[keep]
            pts = pts[keep]
        else:
            pick = rng.permutation(len(perm))[: n_support - count]
            sampled.append(ids[perm[pick]])
            break
    return jnp.asarray(np.concatenate(sampled), jnp.int32)


def compute_spatial(pos: jnp.ndarray, decoder_queries: jnp.ndarray = None,
                    decoder_k: int = 64,
                    sampler=None) -> Dict[str, jnp.ndarray]:
    """pos [N,3] -> dict matching the reference's spatial keys:
    support1..4, ids00..ids44, ids43..ids10 (+ proj_indices if queries).
    `sampler`: (points, m) -> indices; defaults to FPS."""
    n = pos.shape[0]
    sizes = [max(1, -(-n // 4)), ]
    for _ in range(3):
        sizes.append(max(1, -(-sizes[-1] // 4)))
    if sampler is None:
        sampler = farthest_point_sampling

    out = {"pos": pos}
    supports = [pos]
    for lvl, m in enumerate(sizes, start=1):
        idx = sampler(supports[-1], m)
        sup = supports[-1][idx]
        out[f"support{lvl}"] = sup
        supports.append(sup)

    def ids(src, dst, k):
        return knn(dst, src, min(k, src.shape[0]))[1]

    p, s1, s2, s3, s4 = supports
    out["ids00"] = ids(p, p, 16)
    out["ids01"] = ids(p, s1, 16)
    out["ids11"] = ids(s1, s1, 16)
    out["ids12"] = ids(s1, s2, 16)
    out["ids22"] = ids(s2, s2, 16)
    out["ids23"] = ids(s2, s3, 16)
    out["ids33"] = ids(s3, s3, 16)
    out["ids34"] = ids(s3, s4, 16)
    out["ids44"] = ids(s4, s4, 16)
    out["ids43"] = ids(s4, s3, 1)
    out["ids32"] = ids(s3, s2, 1)
    out["ids21"] = ids(s2, s1, 1)
    out["ids10"] = ids(s1, p, 1)
    if decoder_queries is not None:
        out["proj_indices"] = ids(p, decoder_queries, decoder_k)
    return out
