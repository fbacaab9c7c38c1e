"""Fused multi-head self-attention kernel for the diffusion UNet.

Under XLA, the UNet's image self-attention at 32^2 tokens materializes a
[B, heads, 1024, 1024] fp32 logits tensor in HBM (~268 MB per block
eval) and re-reads it through the softmax — ~2 ms/block of pure HBM
traffic on v5e, ~9 ms of the ~122 ms UNet step (profiled; the convs
themselves already run at 96% of bf16 peak).  The whole (T, T) score
matrix for ONE (batch, head) fits comfortably in VMEM (4 MB fp32 at
T=1024), so this kernel computes q k^T, the fp32 softmax, and the value
contraction entirely on-chip.

The kernel consumes the PACKED qkv projection output [B, T, 3C] in the
checkpoint's legacy head-major layout (per head: [q | k | v], unet.py
QKVAttentionLegacy) and writes [B, T, C]: one HBM read, one write, no
transposes — heads are walked with static in-VMEM slices.  No
flash-style streaming is needed at these sizes: the UNet's largest
attention is 1024 tokens (32^2), head dim 64.

Reference math (exact): AttentionBlock + QKVAttentionLegacy,
/root/reference/models/DDNM/guided_diffusion/unet.py:259-394:
  scores = (q d^-1/4) @ (k d^-1/4)^T;  fp32 softmax;  out = softmax @ v.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-batch-item VMEM budget: qkv + out blocks + one head's fp32 logits
_VMEM_CAP = 14 * 1024 * 1024


def attention_pallas_ok(T: int, heads: int, hd: int) -> bool:
    """True when the fused kernel applies: TPU-like backend, not opted
    out, and the per-program working set fits VMEM.

    Multi-device processes fall back to the XLA einsum path: a raw
    pallas_call is opaque to GSPMD, so under views-on-dp / tp sharding it
    would force an all-gather, while the einsum partitions cleanly over
    the batch and head dims."""
    if os.environ.get("PD_NO_PALLAS_ATTN") == "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if jax.device_count() > 1:
        return False
    if T % 8 or hd % 8:
        return False
    # per-head live set: logits + exp + normalized weights (3 fp32 [T,T])
    # plus the qkv block at fp32 upper bound (12*T*C) and the out block
    # (4*T*C) — budgeting the worst case keeps real headroom at the cap
    C = heads * hd
    working = 3 * 4 * T * T + (12 + 4) * T * C
    return working <= _VMEM_CAP


def _attn_kernel(qkv_ref, o_ref, *, heads, hd, scale):
    for j in range(heads):                     # static unroll per head
        base = 3 * hd * j
        q = qkv_ref[0, :, base:base + hd]                  # [T, hd]
        k = qkv_ref[0, :, base + hd:base + 2 * hd]
        v = qkv_ref[0, :, base + 2 * hd:base + 3 * hd]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [T, T] fp32
        logits = logits * (scale * scale)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[0, :, hd * j:hd * (j + 1)] = out.astype(o_ref.dtype)


def _attention_einsum_ref(qkv: jnp.ndarray, heads: int, hd: int
                          ) -> jnp.ndarray:
    """The XLA einsum formulation of the same legacy-order attention —
    numerically interchangeable with the kernel (parity-tested); used as
    the differentiable surrogate in the custom VJP below."""
    b, t, c3 = qkv.shape
    qkv4 = qkv.reshape(b, t, heads, 3 * hd)
    q, k, v = jnp.split(qkv4, 3, axis=-1)
    scale = 1.0 / (hd ** 0.25)
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    a = jnp.einsum("bhts,bshd->bthd", w.astype(qkv.dtype), v)
    return a.reshape(b, t, heads * hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
@functools.partial(jax.jit, static_argnames=("heads", "hd", "interpret"))
def fused_attention_qkv(qkv: jnp.ndarray, heads: int, hd: int,
                        interpret: bool = False) -> jnp.ndarray:
    """qkv: [B, T, 3*heads*hd] head-major-packed -> out [B, T, heads*hd].

    Grid over B; each program walks all heads of one batch item with the
    full token set resident in VMEM.

    Differentiable: a raw pallas_call has no autodiff rule, so the custom
    VJP recomputes the attention with the einsum reference and pulls the
    cotangent through THAT (rematerialized backward — the training path
    pays two extra matmuls, the inference path is untouched).
    """
    B, T, C3 = qkv.shape
    assert C3 == 3 * heads * hd, (qkv.shape, heads, hd)
    scale = 1.0 / (hd ** 0.25)
    return pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads, hd=hd, scale=scale),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, C3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, heads * hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, heads * hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * heads * T * T * hd,
            bytes_accessed=B * T * heads * hd * 4 * 2,
            transcendentals=B * heads * T * T),
        interpret=interpret,
    )(qkv)


def _fused_attention_fwd(qkv, heads, hd, interpret):
    return fused_attention_qkv(qkv, heads, hd, interpret), qkv


def _fused_attention_bwd(heads, hd, interpret, qkv, g):
    _, vjp = jax.vjp(lambda q: _attention_einsum_ref(q, heads, hd), qkv)
    return vjp(g)


fused_attention_qkv.defvjp(_fused_attention_fwd, _fused_attention_bwd)
