"""Device mesh + sharding helpers.

The reference has no multi-device story beyond torch DataParallel
(SURVEY.md §2.10; diffusion.py:456).  The TPU-native equivalent:

  - mesh axes ('dp', 'tp'): dp shards shapes/views (data parallel over
    ICI), tp shards large matmul feature dims (tensor parallel),
  - the 8-view DDNM batch maps naturally onto dp (8 views <-> 8 cores),
  - atlas-scatter reductions ride psum/all_gather inserted by GSPMD from
    sharding constraints — no hand-written collectives needed.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    """dp x tp mesh over the first n devices. tp defaults to 2 when the
    device count is even and > 1, else 1."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // tp
    arr = np.asarray(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def shard_params_dp_tp(params, mesh: Mesh):
    """Sharding tree: Dense/Conv kernels with an output feature dim
    divisible by tp are sharded over 'tp' on that dim; everything else is
    replicated.  GSPMD then partitions the matching matmuls and inserts
    the reduce collectives."""
    tp = mesh.shape["tp"]

    def rule(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and tp > 1 \
                and x.shape[-1] % tp == 0 and x.shape[-1] >= 2 * tp:
            spec = [None] * (x.ndim - 1) + ["tp"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_views(x: jnp.ndarray, mesh: Mesh):
    """Place a [V, ...] per-view batch with views split over dp."""
    spec = P("dp")
    return jax.device_put(x, NamedSharding(mesh, spec))
