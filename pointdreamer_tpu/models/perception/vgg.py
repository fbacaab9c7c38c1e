"""VGG16 feature extractor + LPIPS perceptual distance in flax (NHWC).

Reference counterpart: the `lpips` pip package used by the texture
evaluation driver (/root/reference/data/run_evaluation.py:18,141-171,
`lpips.LPIPS(net='vgg')`): a torchvision VGG16 backbone tapped at
relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3, unit-normalized per
channel, squared difference, learned non-negative 1x1 "lin" heads,
spatial mean, summed over the 5 taps.

Weights are not bundled (offline build): `convert.py` maps a
user-supplied torchvision `vgg16` state dict plus the lpips `vgg.pth`
lin-head state dict onto this module's param tree; parity is tested
against a torch transcription of the same architecture with random
weights (tests/test_perception.py).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision cfg 'D': conv channel plan, 'M' = 2x2 maxpool
VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")
# features indices (in torchvision's nn.Sequential) after whose ReLU LPIPS
# taps activations: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
LPIPS_TAPS = (1, 3, 6, 9, 12)      # counted in *conv* order (0-based)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

# lpips ScalingLayer constants (lpips/lpips.py ScalingLayer)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 convolutional torso; returns the 5 LPIPS tap activations.

    Input: [N, H, W, 3] float. Param names `conv{i}` follow conv order so
    convert.py can map torchvision's `features.{j}.weight` keys.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        taps = []
        ci = 0
        for item in VGG16_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
                continue
            x = nn.Conv(item, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{ci}")(x)
            x = nn.relu(x)
            if ci in LPIPS_TAPS:
                taps.append(x)
            ci += 1
        return tuple(taps)


def _unit_normalize(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """lpips normalize_tensor: unit L2 norm over the channel axis."""
    norm = jnp.sqrt((feat * feat).sum(-1, keepdims=True))
    return feat / (norm + eps)


class LPIPS(nn.Module):
    """Full LPIPS(net='vgg') distance.

    __call__(a, b): images [N,H,W,3] in [-1, 1] (the reference feeds
    `pred*2-1` at run_evaluation.py:157).  Returns [N] distances.
    Params: `vgg` submodule + `lin{k}` 1x1 heads (kernel [1,1,C,1]).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fa = vgg((a - shift) / scale)
        fb = vgg((b - shift) / scale)
        total = 0.0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            d = (_unit_normalize(xa) - _unit_normalize(xb)) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"lin{k}")(d)           # [N,H,W,1]
            total = total + w.mean(axis=(1, 2))[..., 0]
        return total
