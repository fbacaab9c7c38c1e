"""InceptionV3 feature extractor (FID embedding) in flax (NHWC).

Reference counterpart: utils/metric_utils/inception.py (a torchvision
`inception_v3(pretrained=True)` cut at the final average pooling, 2048-d
features) feeding utils/metric_utils/fid.py's Frechet distance, used by
data/run_evaluation.py:174-215.

Architecture is a faithful transcription of torchvision's Inception3:
every conv is BasicConv2d = Conv(bias=False) + BatchNorm(eps=1e-3) +
ReLU; the block/branch names mirror torchvision state-dict keys
(`Mixed_5b.branch1x1.conv.weight` ...) so convert.py can map a
user-supplied checkpoint mechanically.  The classifier head and
AuxLogits are omitted (not needed for FID).

Input contract matches the reference wrapper (inception.py:70-90):
images in [0,1], bilinearly resized to 299x299, scaled to [-1,1].
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.out_channels, self.kernel, strides=self.stride,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _avgpool3(x):
    # torchvision avg_pool2d(kernel=3, stride=1, padding=1) counts the
    # zero padding in the denominator (count_include_pad=True default)
    s = nn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
    # undo flax's count_exclude semantics? flax avg_pool divides by the
    # window size including padding? It divides by 9 always (it pads with
    # zeros and divides by the full window), matching torch's default.
    return s


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1",
                         dtype=self.dtype)(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2",
                         dtype=self.dtype)(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3",
                         dtype=self.dtype)(b3)
        bp = _avgpool3(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), name="branch3x3",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2), name="branch3x3dbl_3",
                         dtype=self.dtype)(bd)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1",
                         dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2",
                         dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3",
                         dtype=self.dtype)(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5",
                         dtype=self.dtype)(bd)
        bp = _avgpool3(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1",
                         dtype=self.dtype)(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), name="branch3x3_2",
                         dtype=self.dtype)(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1",
                         dtype=self.dtype)(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2",
                         dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3",
                         dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2), name="branch7x7x3_4",
                         dtype=self.dtype)(b7)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1",
                         dtype=self.dtype)(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a",
                          dtype=self.dtype)(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b",
                          dtype=self.dtype)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name="branch3x3dbl_3a", dtype=self.dtype)(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name="branch3x3dbl_3b", dtype=self.dtype)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avgpool3(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """torchvision Inception3 cut at the final average pool -> [N, 2048].

    Input [N,H,W,3] in [0,1]; resized to 299 and scaled to [-1,1] inside
    (reference inception.py:70-90 resize_input/normalize_input)."""

    dtype: Any = jnp.float32
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[-1]), method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=(2, 2), name="Conv2d_1a_3x3",
                        dtype=self.dtype)(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3",
                        dtype=self.dtype)(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3",
                        dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1",
                        dtype=self.dtype)(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3",
                        dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="Mixed_5b", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5c", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5d", dtype=self.dtype)(x)
        x = InceptionB(name="Mixed_6a", dtype=self.dtype)(x)
        x = InceptionC(128, name="Mixed_6b", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6c", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6d", dtype=self.dtype)(x)
        x = InceptionC(192, name="Mixed_6e", dtype=self.dtype)(x)
        x = InceptionD(name="Mixed_7a", dtype=self.dtype)(x)
        x = InceptionE(name="Mixed_7b", dtype=self.dtype)(x)
        x = InceptionE(name="Mixed_7c", dtype=self.dtype)(x)
        return x.mean(axis=(1, 2))          # global average pool -> 2048
