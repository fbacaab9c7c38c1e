"""The DDPM "simple" UNet used by DDNM's CelebA-HQ / LSUN checkpoints.

Reference: models/DDNM/guided_diffusion/models.py (Model, :192-341) — the
Ho et al. DDPM architecture: swish, GroupNorm(32, eps=1e-6), ResnetBlocks
with additive timestep projection, single-head full self-attention at
attn_resolutions, conv/nearest resampling.  Distinct from the
guided-diffusion UNetModel (unet.py): a different timestep-embedding
frequency layout (models.py:6-24), post-skip-concat ResBlocks, and an
asymmetric-padded stride-2 downsample conv (models.py:55-74).

TPU re-design: functional NHWC (torch is NCHW modules); params are a flat
dict keyed by the TORCH state-dict names with conv kernels stored HWIO —
`convert_ddpm_state_dict` is therefore a pure transpose pass and parity
against the torch module is exact.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DDPMPlan(NamedTuple):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    in_channels: int = 3
    resolution: int = 256
    resamp_with_conv: bool = True


def celeba_plan() -> DDPMPlan:
    """configs/celeba_hq.yml of the reference DDNM CLI."""
    return DDPMPlan()


def ddpm_timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """models.py:6-24 — NOTE the /(half-1) frequency spacing (the
    guided-diffusion variant divides by half)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _gn(p, name, x):
    """GroupNorm(32, eps=1e-6) over NHWC channels."""
    c = x.shape[-1]
    g = min(32, c)
    xs = x.reshape(x.shape[:-1] + (g, c // g))
    mean = xs.mean(axis=(1, 2, 4), keepdims=True)
    var = xs.var(axis=(1, 2, 4), keepdims=True)
    xs = (xs - mean) / jnp.sqrt(var + 1e-6)
    x = xs.reshape(x.shape)
    return x * p[name + ".weight"] + p[name + ".bias"]


def _conv(p, name, x, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, p[name + ".weight"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p[name + ".bias"]


def _linear(p, name, x):
    return x @ p[name + ".weight"] + p[name + ".bias"]


def _resblock(p, name, x, temb):
    cin = x.shape[-1]
    h = _conv(p, name + ".conv1", _swish(_gn(p, name + ".norm1", x)))
    h = h + _linear(p, name + ".temb_proj", _swish(temb))[:, None, None, :]
    h = _conv(p, name + ".conv2", _swish(_gn(p, name + ".norm2", h)))
    cout = h.shape[-1]
    if cin != cout:
        x = _conv(p, name + ".nin_shortcut", x)
    return x + h


def _attnblock(p, name, x):
    b, hh, ww, c = x.shape
    h = _gn(p, name + ".norm", x)
    q = _conv(p, name + ".q", h).reshape(b, hh * ww, c)
    k = _conv(p, name + ".k", h).reshape(b, hh * ww, c)
    v = _conv(p, name + ".v", h).reshape(b, hh * ww, c)
    w = jnp.einsum("bic,bjc->bij", q, k,
                   preferred_element_type=jnp.float32) * (c ** -0.5)
    w = jax.nn.softmax(w, axis=2)
    h = jnp.einsum("bij,bjc->bic", w, v).reshape(b, hh, ww, c)
    return x + _conv(p, name + ".proj_out", h)


def _downsample(p, name, x, with_conv):
    if with_conv:
        # models.py:67-71: zero-pad bottom/right, stride-2 VALID conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(p, name + ".conv", x, stride=2, padding="VALID")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def _upsample(p, name, x, with_conv):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
    if with_conv:
        x = _conv(p, name + ".conv", x)
    return x


def ddpm_unet_forward(plan: DDPMPlan, p: Dict, x: jnp.ndarray,
                      t: jnp.ndarray) -> jnp.ndarray:
    """x [B,H,W,C] NHWC, t [B] -> eps [B,H,W,out_ch]
    (models.py:301-341)."""
    temb = ddpm_timestep_embedding(t, plan.ch)
    temb = _linear(p, "temb.dense.0", temb)
    temb = _linear(p, "temb.dense.1", _swish(temb))

    n_lvl = len(plan.ch_mult)
    curr_res = plan.resolution
    hs = [_conv(p, "conv_in", x)]
    for i in range(n_lvl):
        for j in range(plan.num_res_blocks):
            h = _resblock(p, f"down.{i}.block.{j}", hs[-1], temb)
            if curr_res in plan.attn_resolutions:
                h = _attnblock(p, f"down.{i}.attn.{j}", h)
            hs.append(h)
        if i != n_lvl - 1:
            hs.append(_downsample(p, f"down.{i}.downsample", hs[-1],
                                  plan.resamp_with_conv))
            curr_res //= 2

    h = hs[-1]
    h = _resblock(p, "mid.block_1", h, temb)
    h = _attnblock(p, "mid.attn_1", h)
    h = _resblock(p, "mid.block_2", h, temb)

    for i in reversed(range(n_lvl)):
        for j in range(plan.num_res_blocks + 1):
            h = _resblock(p, f"up.{i}.block.{j}",
                          jnp.concatenate([h, hs.pop()], axis=-1), temb)
            if curr_res in plan.attn_resolutions:
                h = _attnblock(p, f"up.{i}.attn.{j}", h)
        if i != 0:
            h = _upsample(p, f"up.{i}.upsample", h, plan.resamp_with_conv)
            curr_res *= 2

    h = _swish(_gn(p, "norm_out", h))
    return _conv(p, "conv_out", h)


def convert_ddpm_state_dict(sd: Dict) -> Dict:
    """Torch Model state dict -> flat jnp dict (conv OIHW -> HWIO,
    linear [O,I] -> [I,O]; norms kept)."""
    out = {}
    for k, v in sd.items():
        a = v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)
        if k.endswith(".weight") and a.ndim == 4:       # conv OIHW
            a = a.transpose(2, 3, 1, 0)
        elif k.endswith(".weight") and a.ndim == 2:     # linear
            a = a.T
        out[k] = jnp.asarray(a.astype(np.float32))
    return out


def init_ddpm_params(plan: DDPMPlan, seed: int = 0) -> Dict:
    """Random params with the exact torch key set (shape-check +
    offline-smoke use; load real checkpoints via
    convert_ddpm_state_dict)."""
    rng = np.random.default_rng(seed)
    p = {}

    def conv(name, cin, cout, k=3):
        s = 1.0 / math.sqrt(cin * k * k)
        p[name + ".weight"] = jnp.asarray(
            rng.uniform(-s, s, (k, k, cin, cout)).astype(np.float32))
        p[name + ".bias"] = jnp.asarray(
            rng.uniform(-s, s, (cout,)).astype(np.float32))

    def lin(name, cin, cout):
        s = 1.0 / math.sqrt(cin)
        p[name + ".weight"] = jnp.asarray(
            rng.uniform(-s, s, (cin, cout)).astype(np.float32))
        p[name + ".bias"] = jnp.asarray(
            rng.uniform(-s, s, (cout,)).astype(np.float32))

    def norm(name, c):
        p[name + ".weight"] = jnp.ones((c,), jnp.float32)
        p[name + ".bias"] = jnp.zeros((c,), jnp.float32)

    def res(name, cin, cout):
        norm(name + ".norm1", cin)
        conv(name + ".conv1", cin, cout)
        lin(name + ".temb_proj", 4 * plan.ch, cout)
        norm(name + ".norm2", cout)
        conv(name + ".conv2", cout, cout)
        if cin != cout:
            conv(name + ".nin_shortcut", cin, cout, k=1)

    def attn(name, c):
        norm(name + ".norm", c)
        for nm in ("q", "k", "v", "proj_out"):
            conv(f"{name}.{nm}", c, c, k=1)

    lin("temb.dense.0", plan.ch, 4 * plan.ch)
    lin("temb.dense.1", 4 * plan.ch, 4 * plan.ch)
    conv("conv_in", plan.in_channels, plan.ch)

    n_lvl = len(plan.ch_mult)
    in_mult = (1,) + plan.ch_mult
    curr_res = plan.resolution
    block_in = plan.ch
    for i in range(n_lvl):
        block_in = plan.ch * in_mult[i]
        block_out = plan.ch * plan.ch_mult[i]
        for j in range(plan.num_res_blocks):
            res(f"down.{i}.block.{j}", block_in, block_out)
            block_in = block_out
            if curr_res in plan.attn_resolutions:
                attn(f"down.{i}.attn.{j}", block_in)
        if i != n_lvl - 1:
            if plan.resamp_with_conv:
                conv(f"down.{i}.downsample.conv", block_in, block_in)
            curr_res //= 2

    res("mid.block_1", block_in, block_in)
    attn("mid.attn_1", block_in)
    res("mid.block_2", block_in, block_in)

    for i in reversed(range(n_lvl)):
        block_out = plan.ch * plan.ch_mult[i]
        skip_in = plan.ch * plan.ch_mult[i]
        for j in range(plan.num_res_blocks + 1):
            if j == plan.num_res_blocks:
                skip_in = plan.ch * in_mult[i]
            res(f"up.{i}.block.{j}", block_in + skip_in, block_out)
            block_in = block_out
            if curr_res in plan.attn_resolutions:
                attn(f"up.{i}.attn.{j}", block_in)
        if i != 0:
            if plan.resamp_with_conv:
                conv(f"up.{i}.upsample.conv", block_in, block_in)
            curr_res *= 2

    norm("norm_out", block_in)
    conv("conv_out", block_in, plan.out_ch)
    return p
