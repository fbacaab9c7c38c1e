"""Fused Winograd F(2x2, 3x3) convolution for the diffusion UNet.

The DDNM denoise loop is ~98% 3x3/stride-1 convolutions by FLOPs and XLA's
direct conv runs them at 60-80% of the v5e's bf16 peak — the loop is
compute-bound, so the only way below it is to do fewer MXU flops.
Winograd F(2x2,3x3) computes each 2x2 output tile with 16 multiplies per
(cin,cout) pair instead of 36: a 2.25x multiply reduction.  On GPUs the
transform traffic usually kills it; here the input/output transforms are
fused into the kernel and never touch HBM:

  HBM reads:  one 10-row input strip per 8 output rows (1.25x input) +
              the pre-transformed weights U = G w G^T  [16, Cin, Cout]
  VMEM:       B^T d B built from 16 STATIC slices of an even/odd
              row/column decomposition of the strip (no strided memory
              ops), 16 [P, Cin] x [Cin, Co] MXU GEMMs, A^T m A combine
  HBM writes: the 8-row output strip, once

Matches jax.lax.conv_general_dilated(..., padding=[(1,1),(1,1)]) on an
NHWC/HWIO layout exactly up to bf16 rounding of the transforms (the
product is verified against the direct conv in tests at fp32-interpret
and bf16-device tolerances).

Reference workload: guided_diffusion UNet ResBlock convs,
/root/reference/models/DDNM/guided_diffusion/unet.py:143-257.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) weight transform (Lavin & Gray).  B/A live implicitly in
# the kernel's add patterns.
_G = np.array([[1.0, 0.0, 0.0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0.0, 0.0, 1.0]], np.float32)

_VMEM_CAP = 100 * 1024 * 1024  # generous; real cap set per-call below


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Cin,Cout] -> U [16, Cin, Cout] with U[4u+v] = (G w G^T)[u,v].

    Computed in fp32 (cheap, once per conv — XLA hoists it out of the
    denoise scan because the weights are loop constants), stored bf16.
    """
    wf = w.astype(jnp.float32)
    u = jnp.einsum("ui,ijco,vj->uvco", _G, wf, _G)
    return u.reshape(16, *w.shape[2:]).astype(jnp.bfloat16)


def winograd_ok(h: int, w: int, cin: int, cout: int) -> bool:
    """Kernel applies: TPU-like single-device backend, even spatial dims
    >= 8 rows per strip, lane-aligned channels."""
    if os.environ.get("PD_NO_PALLAS_WINOGRAD") == "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if jax.device_count() > 1:
        return False
    if h % 8 or w % 2 or cin % 128 or cout % 128:
        return False
    # per-strip VMEM: strip + 16 V tiles + fp32 M + out strip + U
    tx = w // 2
    p = 4 * tx
    need = (10 * (w + 2) * cin * 2          # strip (bf16)
            + 16 * p * cin * 2              # V
            + 16 * p * min(cout, 128) * 4   # M (fp32)
            + 8 * w * cout * 2              # out strip
            + 16 * cin * cout * 2)          # U
    return need <= 14 * 1024 * 1024


def _wino_kernel(x_ref, u_ref, o_ref, strip, sem, *, W, WP, Cin, Cout, OB):
    b = pl.program_id(0)
    si = pl.program_id(1)

    # ---- input strip: 10 padded rows for 8 output rows ------------------
    cp = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(8 * si, 10)], strip, sem)
    cp.start()
    cp.wait()

    TX = W // 2
    P = 4 * TX

    # even/odd row & column decomposition -> 16 static tile views
    # strip [10, WP, C] -> [5, 2, WP//2, 2, C]  (cols beyond W+2 are pad)
    q = strip[:].reshape(5, 2, WP // 2, 2, Cin)

    def s(i, j):   # d_tile[ty, tx] = strip[2ty+i, 2tx+j]  -> [4, TX, C]
        return q[i // 2: i // 2 + 4, i % 2,
                 j // 2: j // 2 + TX, j % 2, :]

    # B^T d  (rows):  t[u][j], each [4, TX, C]
    t = [[None] * 4 for _ in range(4)]
    for j in range(4):
        d0, d1, d2, d3 = s(0, j), s(1, j), s(2, j), s(3, j)
        t[0][j] = d0 - d2
        t[1][j] = d1 + d2
        t[2][j] = d2 - d1
        t[3][j] = d1 - d3
    # (B^T d) B  (cols) -> V[u][v] flattened to [P, Cin]
    v = [[None] * 4 for _ in range(4)]
    for u in range(4):
        t0, t1, t2, t3 = t[u]
        v[u][0] = (t0 - t2).reshape(P, Cin)
        v[u][1] = (t1 + t2).reshape(P, Cin)
        v[u][2] = (t2 - t1).reshape(P, Cin)
        v[u][3] = (t1 - t3).reshape(P, Cin)

    # ---- 16 GEMMs per output-channel block, then A^T m A ----------------
    for ob in range(Cout // OB):
        m = [[None] * 4 for _ in range(4)]
        for u in range(4):
            for vv in range(4):
                m[u][vv] = jnp.dot(
                    v[u][vv],
                    u_ref[4 * u + vv, :, pl.ds(ob * OB, OB)],
                    preferred_element_type=jnp.float32)      # [P, OB]
        # rows: z[dy][v] ; dy=0: m0+m1+m2, dy=1: m1-m2-m3
        for vv in range(4):
            z0 = m[0][vv] + m[1][vv] + m[2][vv]
            z1 = m[1][vv] - m[2][vv] - m[3][vv]
            m[0][vv], m[1][vv] = z0, z1
        y = [[(m[dy][0] + m[dy][1] + m[dy][2]).reshape(4, TX, OB),
              (m[dy][1] - m[dy][2] - m[dy][3]).reshape(4, TX, OB)]
             for dy in range(2)]
        # interleave the 2x2 phases back into the [8, W, OB] strip with
        # stack+reshape (Mosaic has no sub-32-bit strided store)
        rows = [jnp.stack([y[dy][0], y[dy][1]], axis=2).reshape(4, W, OB)
                for dy in range(2)]                     # dx interleave
        out = jnp.stack(rows, axis=1).reshape(8, W, OB)  # dy interleave
        o_ref[0, :, :, pl.ds(ob * OB, OB)] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret",))
def winograd_conv3x3(x: jnp.ndarray, w: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """x [B,H,W,Cin] bf16, w [3,3,Cin,Cout] -> [B,H,W,Cout] bf16.

    'same' padding, stride 1 — the UNet ResBlock conv contract.
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    u = transform_weights(w)                            # [16, Cin, Cout]
    # pad width to a multiple of 8: Mosaic DMA slices of an HBM-resident
    # array must be aligned to its (8,128) tiling on the last two dims
    WP = -(-(W + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, WP - W - 1), (0, 0)))
    OB = min(Cout, 128)
    kern = functools.partial(_wino_kernel, W=W, WP=WP, Cin=Cin, Cout=Cout,
                             OB=OB)
    flops = 2 * B * H * W * Cin * Cout * 4   # 16 muls / 4 outputs
    return pl.pallas_call(
        kern,
        grid=(B, H // 8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x stays in HBM
            pl.BlockSpec((16, Cin, Cout), lambda b, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, W, Cout), lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((10, WP, Cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(B * H * W * (Cin + Cout) * 2 * 5 // 4
                            + 16 * Cin * Cout * 2),
            transcendentals=0),
        interpret=interpret,
    )(xp, u)
