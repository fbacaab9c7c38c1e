"""Mosaic kernel: dense per-texel segment sums from base-sorted pixels.

The atlas-optimize backward needs, per Adam iteration, the dense
[R*R, 12] per-texel sums of bilinear corner contributions from pixels
SORTED by base texel.  XLA's gather/scatter engine does this at
~13 ns/output-row (measured on v5e, any formulation — sortedness hints,
scatter-set, transposed gathers); this kernel does it at ~1.8 ns/row by
turning the segment reduction into an in-VMEM interval one-hot matmul:

  grid over blocks of B texels; the pixels of a block form a contiguous
  window of the sorted stream (monotone cumulative counts), fetched via
  a scalar-prefetched element offset quantized to the 128-lane tiling;
  out[12, B] = contribT_window [12, W2] @ onehot [W2, B], where
  onehot[w, b] = (base[w] == block_start + b).  With the 12-channel axis
  as M, the MXU pad is ceil(12/8)*8 = 16 rows — not the 128-lane pad a
  [.., B]-major layout would eat.  Out-of-block pixels in the window
  (quantization slack + neighbours) self-mask: their base never matches
  the block's texel range.

Used by pipeline/optimize.py (reference optimize_color,
pointdreamer/ours_utils.py:1583-1785).  Exact: each output element is
one matmul dot over exact {0,1} weights in f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element

BASE_SENTINEL = 2 ** 30


def _kernel(off_ref, base_w, cw, out_ref, *, B, W2):
    j = pl.program_id(0)
    t0 = j * B
    local = base_w[0, :] - t0                                  # [W2]
    onehot = (local[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (W2, B), 1))
    out_ref[...] = jax.lax.dot_general(
        cw[...], onehot.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [12,B]


@functools.lru_cache(maxsize=None)
def _build(n_tex: int, kpad: int, B: int, W2: int, interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tex // B,),
        in_specs=[
            pl.BlockSpec((Element(1), Element(W2)),
                         lambda j, off: (0, off[j] * 128)),
            pl.BlockSpec((Element(12), Element(W2)),
                         lambda j, off: (0, off[j] * 128)),
        ],
        out_specs=pl.BlockSpec((12, B), lambda j, off: (0, j)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, B=B, W2=W2), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((12, n_tex), jnp.float32),
        interpret=interpret)


def segment_sum_expand(contribT: jnp.ndarray,   # [12, Kpad] f32
                       base_row: jnp.ndarray,   # [1, Kpad] int32 (sorted,
                                                #  pads = BASE_SENTINEL)
                       off128: jnp.ndarray,     # [n_tex//B] int32: window
                                                #  start / 128 per block
                       n_tex: int, B: int, W2: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Returns [12, n_tex]: per-texel sums of contribT columns grouped by
    base_row.  W2 (multiple of 128) must cover the max pixels per
    B-texel block plus 128 quantization slack; off128[j]*128 + W2 must
    stay within Kpad."""
    fn = _build(n_tex, contribT.shape[1], B, W2, interpret)
    return fn(off128, base_row, contribT)
