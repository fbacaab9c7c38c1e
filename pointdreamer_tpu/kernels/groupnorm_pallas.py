"""Fused GroupNorm(+scale-shift)(+SiLU) kernel for the diffusion UNet.

Every UNet block is GroupNorm32 -> (emb scale-shift) -> SiLU -> conv
(reference guided_diffusion unet.py:143-257, nn.py GroupNorm32).  Under
XLA the fp32 norm, the [B,1,1,C] scale-shift broadcast and the SiLU are
separate HBM passes around the conv; measured on v5e the sequence runs
at 82% of its 3-pass roofline on the big 256^2x256 tensors and at ~30%
on the many small 16^2/8^2x1024 ones (launch + relayout overheads
dominate there).

This kernel does the whole thing in ONE pallas_call per tensor:
  pass 1 (grid phase 0): accumulate per-channel fp32 sum/sum-of-squares
    chunk by chunk; on the last chunk reduce channels->groups with an
    indicator matmul (MXU) and fold (gamma, beta, mean, rstd) into a
    single per-channel (scale, bias) pair kept in VMEM scratch;
  pass 2 (grid phase 1): re-read each chunk, apply y = x*scale + bias,
    the optional per-batch (1+s)/shift from the timestep embedding, the
    optional SiLU, and write the result once in the compute dtype.

Exactly 2 HBM reads + 1 write — the same traffic as a perfectly fused
XLA schedule, with none of the fp32 intermediates or per-op launches.
The phase trick: the output BlockSpec maps phase 0 to block (b, 0), so
consecutive phase-0 steps share one resident VMEM block and nothing is
written back until phase 1 refills it with real values.

Stats use E[x^2] - E[x]^2 in fp32, matching flax.linen.GroupNorm's
fp32 path to ~1e-6 (asserted in tests/test_pallas_groupnorm.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GROUPS = 32


def _chunk_for(S: int, C: int) -> int:
    # keep in+out blocks (double-buffered) well inside VMEM at any C:
    # chunk*C <= 512k elems -> <= 2 MB bf16 per block
    return max(8, min(S, (512 * 1024) // C // 8 * 8))


def groupnorm_pallas_ok(S: int, C: int) -> bool:
    """TPU-like single-device backend, lane-aligned channels, chunkable
    spatial extent (the UNet's S/C are powers of two)."""
    if os.environ.get("PD_NO_PALLAS_GN") == "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if jax.device_count() > 1:
        return False
    if C % 128 or C // _GROUPS < 1:
        return False
    chunk = _chunk_for(S, C)
    return S % chunk == 0 and chunk % 8 == 0


def _gn_kernel(x_ref, g_ref, b_ref, ss_ref, o_ref,
               acc, stat, *, n_chunks, n_elems, C, eps, silu, has_ss):
    phase = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when((phase == 0) & (i == 0))
    def _():
        acc[...] = jnp.zeros_like(acc)

    @pl.when(phase == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)              # [CHUNK, C]
        acc[0, :] += jnp.sum(xf, axis=0)
        acc[1, :] += jnp.sum(xf * xf, axis=0)

    @pl.when((phase == 0) & (i == n_chunks - 1))
    def _():
        gs = C // _GROUPS
        # channels -> groups -> channels with two RECTANGULAR indicator
        # matmuls ([C,32] then [32,C]): a square [C,C] indicator is
        # 16.8 MB of VMEM at the UNet's C=2048 concat blocks
        cid = jax.lax.broadcasted_iota(jnp.int32, (C, _GROUPS), 0) // gs
        gid = jax.lax.broadcasted_iota(jnp.int32, (C, _GROUPS), 1)
        ind = (cid == gid).astype(jnp.float32)          # [C, 32]
        grp = jnp.dot(acc[...], ind,
                      preferred_element_type=jnp.float32)   # [2, 32]
        tot = jnp.dot(grp, ind.T,
                      preferred_element_type=jnp.float32)   # [2, C] grouped
        mean = tot[0] / n_elems
        var = tot[1] / n_elems - mean * mean
        rstd = jax.lax.rsqrt(var + eps)
        gamma = g_ref[0].astype(jnp.float32)
        beta = b_ref[0].astype(jnp.float32)
        stat[0, :] = gamma * rstd                       # scale
        stat[1, :] = beta - mean * gamma * rstd         # bias

    @pl.when(phase == 1)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        y = xf * stat[0, :][None, :] + stat[1, :][None, :]
        if has_ss:
            ssf = ss_ref[0, 0].astype(jnp.float32)      # [2C]: scale|shift
            y = y * (1.0 + ssf[:C][None, :]) + ssf[C:][None, :]
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("silu", "out_dtype",
                                             "interpret", "eps"))
def fused_groupnorm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                    ss: jnp.ndarray | None = None, *, silu: bool = True,
                    eps: float = 1e-5, out_dtype=jnp.bfloat16,
                    interpret: bool = False) -> jnp.ndarray:
    """x [B, S, C] (any float) -> [B, S, C] out_dtype.

    GroupNorm(32 groups, fp32 stats, per-channel gamma/beta), then
    optionally y*(1+ss[:, :C]) + ss[:, C:] (the ResBlock's scale-shift
    from the timestep embedding, ss [B, 2C]), then optionally SiLU.
    """
    B, S, C = x.shape
    chunk = _chunk_for(S, C)
    if S % chunk:
        # the grid only visits S // chunk row blocks — a ragged tail would
        # be silently left uninitialized (callers gate via groupnorm_pallas_ok)
        raise ValueError(f"fused_groupnorm: S={S} not divisible by "
                         f"chunk={chunk}")
    n_chunks = S // chunk
    if ss is None:
        has_ss = False
        ss = jnp.zeros((B, 2 * C), x.dtype)
    else:
        has_ss = True
    kern = functools.partial(
        _gn_kernel, n_chunks=n_chunks, n_elems=float(S * (C // _GROUPS)),
        C=C, eps=eps, silu=silu, has_ss=has_ss)
    return pl.pallas_call(
        kern,
        grid=(B, 2, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda b, p, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * C), lambda b, p, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # phase 0 parks every step on block (b, 0): consecutive steps
        # share the resident block, so no garbage is flushed; phase 1
        # walks the chunks and writes the real values
        out_specs=pl.BlockSpec((1, chunk, C), lambda b, p, i: (b, i * p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, C), jnp.float32),      # sum / sumsq
            pltpu.VMEM((2, C), jnp.float32),      # folded scale / bias
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * S * C,
            bytes_accessed=3 * B * S * C * x.dtype.itemsize,
            transcendentals=B * S * C if silu else 0),
        interpret=interpret,
    )(x, gamma.reshape(1, C), beta.reshape(1, C), ss.reshape(B, 1, 2 * C))
