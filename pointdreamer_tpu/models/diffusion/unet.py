"""Guided-diffusion UNet in flax (NHWC, bf16 compute, fp32 norms).

Architecture-exact port of the reference OpenAI 256x256 unconditional
UNet (models/DDNM/guided_diffusion/unet.py:396 UNetModel, configured by
script_util.py:130-186 + configs/imagenet_256.yml: 256 base channels,
2 res blocks, channel_mult (1,1,2,2,4,4), attention at ds 8/16/32,
num_head_channels 64, scale-shift GroupNorm, resblock up/down,
learn_sigma -> 6 output channels).

TPU-first differences from the torch code (none change the math):
  - NHWC layout (TPU conv native) instead of NCHW,
  - bf16 activations/weights on the torso, fp32 GroupNorm + softmax,
  - attention is one batched einsum over heads (no reshape to bs*heads).

The construction order exactly mirrors the torch module tree so
convert.py can map `input_blocks.3.0.in_layers.0.weight`-style checkpoint
keys onto the flax param tree mechanically.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embeddings (reference nn.py:103-121)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _norm(name: str):
    # GroupNorm32: computed in fp32 (reference nn.py GroupNorm32)
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                        name=name)


def _act_amax(mod: nn.Module, xf: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor activation abs-max for int8 quantization.

    Static when the module has an `act_scales` collection entry (written
    by `calibrate_act_scales` — saves the extra fp32 reduction pass over
    every torso activation, and lets XLA fuse the quantize into the
    producing GroupNorm/SiLU); dynamic otherwise, in which case the
    observed max is sown to the `calib` collection so a calibration
    apply(mutable=["calib"]) can harvest it.  Values beyond a static
    scale saturate at +-127 (the clip below), which the fidelity gate
    bounds (tests/test_diffusion.py)."""
    if mod.has_variable("act_scales", "amax"):
        return mod.get_variable("act_scales", "amax")
    amax = jnp.max(jnp.abs(xf))
    mod.sow("calib", "amax", amax, reduce_fn=jnp.maximum,
            init_fn=lambda: jnp.zeros((), jnp.float32))
    return amax


class QConv8(nn.Module):
    """w8a8 conv: per-output-channel int8 weights (pre-quantized by
    `quantize_unet_params`), per-tensor int8 activations (static scale
    from calibration when available, else dynamic — see `_act_amax`),
    int32 MXU accumulation, fp32 dequant.  Same param path layout as
    nn.Conv (module_name/{kernel_q,kernel_s,bias}) so the tree transform
    is mechanical.  v5e int8 peak is 2x bf16; measured conv throughput
    275 TOP/s vs 162 TFLOP/s bf16 (see README)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (kh, kw, cin, self.features), jnp.int8)
        ks = self.param("kernel_s", nn.initializers.ones,
                        (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        ax = jnp.maximum(_act_amax(self, xf), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / ax), -127, 127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
        p = self.padding
        y = jax.lax.conv_general_dilated(
            xq, kq, self.strides, [(p, p), (p, p)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (ax * ks) + b
        return y.astype(self.dtype)


class QDense8(nn.Module):
    """w8a8 dense twin of QConv8 (attention qkv/proj)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (cin, self.features), jnp.int8)
        ks = self.param("kernel_s", nn.initializers.ones,
                        (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        ax = jnp.maximum(_act_amax(self, xf), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / ax), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(xq, kq, (((xq.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (ax * ks) + b
        return y.astype(self.dtype)


def _conv(quant: bool, features, kernel_size, name, strides=(1, 1),
          padding=1, dtype=jnp.bfloat16, kernel_init=None):
    """nn.Conv in fp mode, QConv8 in w8a8 mode — identical param paths."""
    if quant:
        return QConv8(features, tuple(kernel_size), tuple(strides),
                      padding, dtype=dtype, name=name)
    kw = {"kernel_init": kernel_init} if kernel_init is not None else {}
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   dtype=dtype, name=name, **kw)


class ResBlock(nn.Module):
    """reference unet.py:143-257."""

    out_channels: int
    emb_channels: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = _norm("in_norm")(x).astype(self.dtype)
        h = nn.silu(h)
        if self.up:
            h = _nearest_up2(h)
            x = _nearest_up2(x)
        elif self.down:
            h = _avg_down2(h)
            x = _avg_down2(x)
        h = _conv(self.quant, self.out_channels, (3, 3), "in_conv",
                  dtype=self.dtype)(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels, dtype=self.dtype, name="emb")(
                nn.silu(emb)).astype(self.dtype)
        emb_out = emb_out[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _norm("out_norm")(h).astype(self.dtype) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = _norm("out_norm")(h).astype(self.dtype)
        h = nn.silu(h)
        h = _conv(self.quant, self.out_channels, (3, 3), "out_conv",
                  dtype=self.dtype, kernel_init=nn.initializers.zeros)(h)

        if in_ch != self.out_channels:
            x = _conv(self.quant, self.out_channels, (1, 1), "skip",
                      padding=0, dtype=self.dtype)(x)
        return x.astype(self.dtype) + h


def _nearest_up2(x):
    # broadcast+reshape, not jax.image.resize: resize lowers to a gather
    # that runs at ~29% of HBM roofline on v5e; the broadcast form is a
    # pure layout op XLA fuses with the consumer (measured in-scan on the
    # UNet's sizes — see README perf notes).  Bit-identical for integer 2x.
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, 2 * h, 2 * w, c)


def _avg_down2(x):
    # reshape+mean twin of nn.avg_pool((2,2),(2,2)) — same values, but a
    # reshape/reduce XLA tiles better than reduce_window on TPU
    b, h, w, c = x.shape
    xf = x.reshape(b, h // 2, 2, w // 2, 2, c).astype(jnp.float32)
    return xf.mean(axis=(2, 4)).astype(x.dtype)


class AttentionBlock(nn.Module):
    """reference unet.py:259-305 + QKVAttentionLegacy (:329-358)."""

    num_head_channels: int = 64
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = c // self.num_head_channels
        hd = self.num_head_channels
        y = _norm("norm")(x.reshape(b, h * w, c)).astype(self.dtype)
        qkv = (QDense8(3 * c, dtype=self.dtype, name="qkv") if self.quant
               else nn.Dense(3 * c, dtype=self.dtype, name="qkv"))(y)
        from ...kernels.attention_pallas import (attention_pallas_ok,
                                                 fused_attention_qkv)

        if attention_pallas_ok(h * w, heads, hd):
            # fused in-VMEM softmax on the packed qkv: XLA's path round-
            # trips the fp32 [b,heads,t,t] logits through HBM (~2 ms per
            # 32^2 block)
            a = fused_attention_qkv(qkv, heads, hd)
        else:
            # legacy order: per head, channels are [q | k | v]
            qkv4 = qkv.reshape(b, h * w, heads, 3 * hd)
            q, k, v = jnp.split(qkv4, 3, axis=-1)       # [b,t,heads,hd]
            scale = 1.0 / math.sqrt(math.sqrt(hd))
            logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                                preferred_element_type=jnp.float32)
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            a = jnp.einsum("bhts,bshd->bthd", weights.astype(self.dtype), v)
            a = a.reshape(b, h * w, c)
        out = (QDense8(c, dtype=self.dtype, name="proj") if self.quant
               else nn.Dense(c, dtype=self.dtype,
                             kernel_init=nn.initializers.zeros, name="proj"))(a)
        return x + out.reshape(b, h, w, c).astype(x.dtype)


class Upsample(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        x = _nearest_up2(x)
        return _conv(self.quant, self.out_channels, (3, 3), "conv",
                     dtype=self.dtype)(x)


class Downsample(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        return _conv(self.quant, self.out_channels, (3, 3), "conv",
                     strides=(2, 2), dtype=self.dtype)(x)


def unet_plan(model_channels=256, num_res_blocks=2,
              channel_mult=(1, 1, 2, 2, 4, 4),
              attention_ds=(8, 16, 32), resblock_updown=True):
    """Reproduce the torch constructor's block layout (unet.py:470-607).

    Returns (input_plan, middle_plan, output_plan, skip_channels) where each
    plan entry is a list of (kind, out_ch, flags) describing the
    TimestepEmbedSequential at that index — shared by the flax model and
    the checkpoint converter.
    """
    ch = int(channel_mult[0] * model_channels)
    input_plan: List[List[Tuple]] = [[("conv", ch, {})]]
    skip_chans = [ch]
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            layers = [("res", int(mult * model_channels), {})]
            ch = int(mult * model_channels)
            if ds in attention_ds:
                layers.append(("attn", ch, {}))
            input_plan.append(layers)
            skip_chans.append(ch)
        if level != len(channel_mult) - 1:
            if resblock_updown:
                input_plan.append([("res", ch, {"down": True})])
            else:
                input_plan.append([("down", ch, {})])
            skip_chans.append(ch)
            ds *= 2
    middle_plan = [("res", ch, {}), ("attn", ch, {}), ("res", ch, {})]
    output_plan: List[List[Tuple]] = []
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            skip_chans.pop()
            layers = [("res", int(model_channels * mult), {})]
            ch = int(model_channels * mult)
            if ds in attention_ds:
                layers.append(("attn", ch, {}))
            if level and i == num_res_blocks:
                if resblock_updown:
                    layers.append(("res", ch, {"up": True}))
                else:
                    layers.append(("up", ch, {}))
                ds //= 2
            output_plan.append(layers)
    return input_plan, middle_plan, output_plan


class UNetModel(nn.Module):
    """Flax twin of reference UNetModel (unet.py:396-664)."""

    model_channels: int = 256
    out_channels: int = 6
    num_res_blocks: int = 2
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4, 4)
    attention_ds: Sequence[int] = (8, 16, 32)
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    dtype: Any = jnp.bfloat16
    quant: bool = False      # w8a8 torso (input/output convs stay fp)

    def _layer(self, kind, out_ch, flags, name):
        if kind == "conv":
            # first conv: 3-channel input, negligible FLOPs — keep fp
            return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                           name=name)
        if kind == "res":
            return ResBlock(out_ch, 4 * self.model_channels,
                            self.use_scale_shift_norm,
                            up=flags.get("up", False),
                            down=flags.get("down", False),
                            dtype=self.dtype, quant=self.quant, name=name)
        if kind == "attn":
            return AttentionBlock(self.num_head_channels, dtype=self.dtype,
                                  quant=self.quant, name=name)
        if kind == "up":
            return Upsample(out_ch, dtype=self.dtype, quant=self.quant,
                            name=name)
        if kind == "down":
            return Downsample(out_ch, dtype=self.dtype, quant=self.quant,
                              name=name)
        raise ValueError(kind)

    @nn.compact
    def __call__(self, x, timesteps):
        """x: [N, H, W, 3] float; timesteps: [N]. Returns [N, H, W, out]."""
        input_plan, middle_plan, output_plan = unet_plan(
            self.model_channels, self.num_res_blocks,
            tuple(self.channel_mult), tuple(self.attention_ds),
            self.resblock_updown)

        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(4 * self.model_channels, dtype=self.dtype,
                       name="time_embed_0")(emb.astype(self.dtype))
        emb = nn.Dense(4 * self.model_channels, dtype=self.dtype,
                       name="time_embed_2")(nn.silu(emb))

        h = x.astype(self.dtype)
        hs = []
        for i, layers in enumerate(input_plan):
            for j, (kind, oc, flags) in enumerate(layers):
                mod = self._layer(kind, oc, flags, f"input_{i}_{j}")
                h = mod(h, emb) if kind == "res" else mod(h)
            hs.append(h)
        for j, (kind, oc, flags) in enumerate(middle_plan):
            mod = self._layer(kind, oc, flags, f"middle_{j}")
            h = mod(h, emb) if kind == "res" else mod(h)
        for i, layers in enumerate(output_plan):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for j, (kind, oc, flags) in enumerate(layers):
                mod = self._layer(kind, oc, flags, f"output_{i}_{j}")
                h = mod(h, emb) if kind == "res" else mod(h)

        h = _norm("out_norm")(h.astype(jnp.float32))
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        return h


def imagenet256_unet(dtype=jnp.bfloat16, quant: bool = False) -> UNetModel:
    """The demo's exact model (imagenet_256.yml:14-33)."""
    return UNetModel(dtype=dtype, quant=quant)


class SuperResModel(nn.Module):
    """Super-resolution UNet (reference unet.py:667-683): the plain
    UNetModel conditioned on a bilinear-upsampled low-resolution image by
    channel concatenation (in_channels doubles)."""

    unet: UNetModel

    @nn.compact
    def __call__(self, x, timesteps, low_res):
        up = jax.image.resize(
            low_res,
            (x.shape[0], x.shape[1], x.shape[2], low_res.shape[-1]),
            method="bilinear")   # F.interpolate align_corners=False
        return self.unet(jnp.concatenate([x, up.astype(x.dtype)], axis=-1),
                         timesteps)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (reference unet.py:22-51): prepend
    the spatial mean as a query token, add a learned positional
    embedding, run one NEW-order QKV attention (unet.py:361-394 — split
    into q/k/v chunks first, then heads), return the pooled token."""

    num_head_channels: int
    out_dim: int

    @nn.compact
    def __call__(self, x):                      # [B, H, W, C] fp32
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
        # torch stores [C, HW+1] initialized randn/sqrt(C); ours is
        # transposed to token-major
        pos = self.param("positional_embedding",
                         nn.initializers.normal(1.0 / math.sqrt(c)),
                         (h * w + 1, c))
        t = t + pos[None]
        qkv = nn.Dense(3 * c, name="qkv_proj")(t)
        heads, hd = c // self.num_head_channels, self.num_head_channels
        q, k, v = jnp.split(qkv, 3, axis=-1)    # NEW order: chunks first
        q = q.reshape(b, -1, heads, hd)
        k = k.reshape(b, -1, heads, hd)
        v = v.reshape(b, -1, heads, hd)
        scale = 1.0 / math.sqrt(math.sqrt(hd))
        logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1)
        a = jnp.einsum("bhts,bshd->bthd", weights, v).reshape(b, -1, c)
        return nn.Dense(self.out_dim, name="c_proj")(a)[:, 0]


class EncoderUNetModel(UNetModel):
    """The half-UNet classifier (reference unet.py:684-850; built by
    script_util.create_classifier :229-266): encoder + middle blocks of
    UNetModel, then a pooled head — 'adaptive' (GN+SiLU+global-mean+
    zero-init 1x1) or 'attention' (GN+SiLU+AttentionPool2d, the
    create_classifier default)."""

    pool: str = "adaptive"

    @nn.compact
    def __call__(self, x, timesteps):
        input_plan, middle_plan, _ = unet_plan(
            self.model_channels, self.num_res_blocks,
            tuple(self.channel_mult), tuple(self.attention_ds),
            self.resblock_updown)

        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(4 * self.model_channels, dtype=self.dtype,
                       name="time_embed_0")(emb.astype(self.dtype))
        emb = nn.Dense(4 * self.model_channels, dtype=self.dtype,
                       name="time_embed_2")(nn.silu(emb))

        h = x.astype(self.dtype)
        for i, layers in enumerate(input_plan):
            for j, (kind, oc, flags) in enumerate(layers):
                mod = self._layer(kind, oc, flags, f"input_{i}_{j}")
                h = mod(h, emb) if kind == "res" else mod(h)
        for j, (kind, oc, flags) in enumerate(middle_plan):
            mod = self._layer(kind, oc, flags, f"middle_{j}")
            h = mod(h, emb) if kind == "res" else mod(h)

        h = nn.silu(_norm("out_norm")(h.astype(jnp.float32)))
        if self.pool == "adaptive":
            h = h.mean(axis=(1, 2))             # AdaptiveAvgPool2d((1,1))
            return nn.Dense(self.out_channels,
                            kernel_init=nn.initializers.zeros,
                            name="out_conv")(h)
        if self.pool == "attention":
            return AttentionPool2d(self.num_head_channels,
                                   self.out_channels, name="out_pool")(h)
        raise ValueError(f"unsupported pool '{self.pool}'")


# ---------------------------------------------------------------------------
# w8a8 param-tree transform

# module names whose {kernel,bias} leaves stay floating point in quant mode
_FP_MODULES = {"time_embed_0", "time_embed_2", "emb"}


def quantize_unet_params(params: Dict, _path=()) -> Dict:
    """fp param tree -> w8a8 param tree for `UNetModel(quant=True)`.

    Every conv/dense kernel on the quantized torso is replaced by
    {kernel_q: int8, kernel_s: f32 per-out-channel abs-max/127 scale,
    bias: f32}; time embeddings, per-block emb projections, the first
    input conv and the final fp32 out_conv keep their fp leaves.  The
    output tree structure matches `UNetModel(quant=True).init` exactly
    (asserted in tests/test_diffusion.py)."""
    out = {}
    for k, v in params.items():
        if not isinstance(v, dict):
            out[k] = v
            continue
        is_conv_site = (set(v) == {"kernel", "bias"}
                        and k not in _FP_MODULES
                        and not (len(_path) == 0 and k in ("out_conv",
                                                           "input_0_0")))
        if is_conv_site:
            kern = v["kernel"].astype(jnp.float32)
            red = tuple(range(kern.ndim - 1))
            s = jnp.maximum(jnp.max(jnp.abs(kern), axis=red), 1e-12) / 127.0
            q = jnp.clip(jnp.round(kern / s), -127, 127).astype(jnp.int8)
            out[k] = {"kernel_q": q, "kernel_s": s,
                      "bias": v["bias"].astype(jnp.float32)}
        else:
            out[k] = quantize_unet_params(v, _path + (k,))
    return out


def calibrate_act_scales(model, params, xs, ts, margin: float = 1.3):
    """Static per-tensor activation scales for the w8a8 torso.

    Runs the quantized model with DYNAMIC scales over the calibration
    inputs `xs` (a sequence of [B,H,W,3] arrays, same shapes) at
    timesteps `ts`, harvests each QConv8/QDense8's observed
    max|activation| via the `calib` sow collection, folds the
    elementwise max across runs, and inflates it by `margin` to absorb
    distribution drift over the sampler trajectory (out-of-range values
    saturate at +-127 instead of growing error).  The returned tree is
    the `act_scales` collection to pass alongside params:

        model.apply({"params": p, "act_scales": scales}, x, t)

    which removes the per-conv fp32 abs-max reduction pass — the
    dominant non-MXU cost of the dynamic w8a8 path (ROADMAP: measured
    ~half the gap between the int8 scan and its quant-traffic-free
    bound)."""
    import jax as _jax

    @_jax.jit
    def one(x, t):
        _, var = model.apply({"params": params}, x, t, mutable=["calib"])
        return var["calib"]

    acc = None
    for x, t in zip(xs, ts):
        c = one(jnp.asarray(x), jnp.asarray(t))
        acc = c if acc is None else _jax.tree_util.tree_map(
            jnp.maximum, acc, c)
    if acc is None:
        raise ValueError("calibrate_act_scales: empty calibration input "
                         "(xs yielded no batches)")
    return _jax.tree_util.tree_map(
        lambda a: (a * margin).astype(jnp.float32), acc)
