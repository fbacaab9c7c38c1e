"""Device mesh + sharding helpers.

The reference has no multi-device story beyond torch DataParallel
(SURVEY.md §2.10; diffusion.py:456).  The TPU-native equivalent:

  - mesh axes ('dp', 'tp'): dp shards shapes/views (data parallel over
    ICI), tp shards paired matmul feature dims (tensor parallel),
  - the 8-view DDNM batch maps naturally onto dp (8 views <-> 8 cores);
    dp is the default axis — tp is opt-in (`make_mesh(n, tp=2)`),
  - atlas-scatter reductions ride psum/all_gather inserted by GSPMD from
    sharding constraints — no hand-written collectives needed.

Tensor parallelism is Megatron-style PAIRED sharding on the UNet tree
(not a blanket last-dim rule): the first op of each two-op chain is
column-parallel (output features split over 'tp'), the second is
row-parallel (input features split over 'tp', partial sums all-reduced
by GSPMD):

  AttentionBlock:  qkv (column, head-major so heads split cleanly)
                   -> attention runs per-shard heads -> proj (row).
  ResBlock:        in_conv (column) -> out_norm/scale-shift/silu on the
                   channel-sharded h (32 GroupNorm groups stay
                   shard-local when tp divides the channel count)
                   -> out_conv (row).

Everything else (time embeddings, per-block emb projection whose output
is the concatenated [scale|shift] pair, skip 1x1, final norm/conv) is
replicated: their FLOPs are negligible and sharding the emb output would
split scale from shift across devices.  `tests/test_parallel.py` asserts
the compiled HLO actually partitions the qkv/proj matmuls and contains
the all-reduce this pairing implies.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              tp: int = 1) -> Mesh:
    """dp x tp mesh over the first n devices.  tp defaults to 1: views-on-dp
    is the workload's natural mapping (8 views <-> 8 cores); tensor
    parallelism is opt-in for meshes with more devices than views."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if n % tp:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    dp = n // tp
    arr = np.asarray(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _unet_rule(path, x, tp):
    """PartitionSpec for one UNet param leaf, or None for 'replicate'.

    path: tuple of dict keys from the root, e.g.
    ('input_3_0', 'in_conv', 'kernel').
    """
    if len(path) < 2 or not hasattr(x, "ndim"):
        return None
    mod, leaf = path[-2], path[-1]
    nd = x.ndim

    def div(dim_size):
        return dim_size % tp == 0 and dim_size >= 2 * tp

    if mod == "qkv" and leaf == "kernel" and nd == 2 and div(x.shape[1]):
        return P(None, "tp")                    # column: heads split
    if mod == "qkv" and leaf == "bias" and div(x.shape[0]):
        return P("tp")
    if mod == "proj" and leaf == "kernel" and nd == 2 and div(x.shape[0]):
        return P("tp", None)                    # row: partial-sum psum
    if mod == "in_conv" and leaf == "kernel" and nd == 4 and div(x.shape[3]):
        return P(None, None, None, "tp")        # column (HWIO out dim)
    if mod == "in_conv" and leaf == "bias" and div(x.shape[0]):
        return P("tp")
    # nested out_conv = the ResBlock's second conv (row-parallel); the
    # top-level final out_conv (path length 2) stays replicated
    if mod == "out_conv" and len(path) > 2 and leaf == "kernel" \
            and nd == 4 and div(x.shape[2]):
        return P(None, None, "tp", None)        # row (HWIO in dim)
    # the GroupNorm between the pair sees channel-sharded h
    if mod == "out_norm" and len(path) > 2 and nd == 1 and div(x.shape[0]):
        return P("tp")
    return None


def shard_params_dp_tp(params, mesh: Mesh):
    """Sharding tree for a param pytree (nested dicts of arrays).

    With tp == 1 (the default mesh) everything is replicated — dp-only
    parallelism over the view/batch axis.  With tp > 1, UNet modules get
    the paired Megatron layout documented in the module docstring; trees
    with no recognized module names fall back to sharding the last dim of
    >=2D kernels (generic column parallelism)."""
    tp = mesh.shape["tp"]
    repl = NamedSharding(mesh, P())

    names = set()

    def collect(d):
        if isinstance(d, dict):
            for k, v in d.items():
                names.add(k)
                collect(v)

    collect(params)
    unet_like = names & {"qkv", "in_conv", "out_norm"}

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if tp == 1:
            return repl
        if unet_like:
            spec = _unet_rule(path, node, tp)
            return NamedSharding(mesh, spec) if spec is not None else repl
        if hasattr(node, "ndim") and node.ndim >= 2 \
                and node.shape[-1] % tp == 0 and node.shape[-1] >= 2 * tp:
            return NamedSharding(mesh, P(*([None] * (node.ndim - 1) + ["tp"])))
        return repl

    return walk(params, ())


def shard_views(x: jnp.ndarray, mesh: Mesh):
    """Place a [V, ...] per-view batch with views split over dp."""
    spec = P("dp")
    return jax.device_put(x, NamedSharding(mesh, spec))
