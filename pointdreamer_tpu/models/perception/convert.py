"""torch -> flax weight conversion for the perception models.

Sources (user-supplied at runtime, not bundled):
  - torchvision `vgg16` state dict            -> VGG16Features params
  - lpips `vgg.pth` lin-head state dict       -> LPIPS lin{k} params
  - torchvision `inception_v3` state dict     -> InceptionV3Features
    params + batch_stats

Reference counterparts: lpips.LPIPS(net='vgg') construction
(data/run_evaluation.py:142) and utils/metric_utils/inception.py:60
(`models.inception_v3(pretrained=True)`).

Also provides random state-dict generators with the exact torchvision key
layout, used by tests/test_perception.py to verify the converters + flax
forward against a torch transcription without pretrained files.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .vgg import LPIPS_CHANNELS, LPIPS_TAPS, VGG16_PLAN

# torchvision vgg16 `features.{i}` indices of the 13 convs (cfg D)
VGG16_TV_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(w):
    """torch conv weight [O,I,Kh,Kw] -> flax [Kh,Kw,I,O]."""
    return _np(w).transpose(2, 3, 1, 0)


# ---------------------------------------------------------------------------
# VGG16 + LPIPS
# ---------------------------------------------------------------------------

def convert_vgg16_state_dict(sd: Dict) -> Dict:
    """torchvision vgg16 state dict -> VGG16Features params."""
    params = {}
    for ci, tv in enumerate(VGG16_TV_CONV_IDX):
        params[f"conv{ci}"] = {
            "kernel": _conv_kernel(sd[f"features.{tv}.weight"]),
            "bias": _np(sd[f"features.{tv}.bias"]),
        }
    return params


def convert_lpips_state_dict(vgg_sd: Dict, lin_sd: Dict) -> Dict:
    """(torchvision vgg16 sd, lpips vgg.pth lin sd) -> LPIPS params."""
    params = {"vgg": convert_vgg16_state_dict(vgg_sd)}
    for k in range(5):
        w = None
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in lin_sd:
                w = lin_sd[key]
                break
        if w is None:
            raise KeyError(f"lin{k} head missing from LPIPS state dict")
        params[f"lin{k}"] = {"kernel": _conv_kernel(w)}
    return params


# ---------------------------------------------------------------------------
# InceptionV3
# ---------------------------------------------------------------------------

def _basic_conv(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    p = {
        "conv": {"kernel": _conv_kernel(sd[f"{prefix}.conv.weight"])},
        "bn": {"scale": _np(sd[f"{prefix}.bn.weight"]),
               "bias": _np(sd[f"{prefix}.bn.bias"])},
    }
    s = {"bn": {"mean": _np(sd[f"{prefix}.bn.running_mean"]),
                "var": _np(sd[f"{prefix}.bn.running_var"])}}
    return p, s

_STEM = ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
         "Conv2d_3b_1x1", "Conv2d_4a_3x3")
_BLOCK_BRANCHES = {
    "Mixed_5b": ("branch1x1", "branch5x5_1", "branch5x5_2",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                 "branch_pool"),
    "Mixed_6a": ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                 "branch3x3dbl_3"),
    "Mixed_6b": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
    "Mixed_7a": ("branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                 "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"),
    "Mixed_7b": ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"),
}
_BLOCK_BRANCHES["Mixed_5c"] = _BLOCK_BRANCHES["Mixed_5b"]
_BLOCK_BRANCHES["Mixed_5d"] = _BLOCK_BRANCHES["Mixed_5b"]
_BLOCK_BRANCHES["Mixed_6c"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_6d"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_6e"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_7c"] = _BLOCK_BRANCHES["Mixed_7b"]


def convert_inception_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """torchvision inception_v3 state dict -> (params, batch_stats)."""
    params, stats = {}, {}
    for name in _STEM:
        params[name], stats[name] = _basic_conv(sd, name)
    for block, branches in _BLOCK_BRANCHES.items():
        params[block], stats[block] = {}, {}
        for br in branches:
            params[block][br], stats[block][br] = _basic_conv(
                sd, f"{block}.{br}")
    return params, stats


# ---------------------------------------------------------------------------
# random torch-layout state dicts (for converter/parity tests)
# ---------------------------------------------------------------------------

def random_vgg16_state_dict(seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    sd = {}
    in_c = 3
    ci = 0
    for item in VGG16_PLAN:
        if item == "M":
            continue
        tv = VGG16_TV_CONV_IDX[ci]
        sd[f"features.{tv}.weight"] = rng.standard_normal(
            (item, in_c, 3, 3)).astype(np.float32) * 0.05
        sd[f"features.{tv}.bias"] = rng.standard_normal(
            (item,)).astype(np.float32) * 0.05
        in_c = item
        ci += 1
    return sd


def random_lpips_lin_state_dict(seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    return {f"lin{k}.model.1.weight":
            np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32)
            for k, c in enumerate(LPIPS_CHANNELS)}


_INCEPTION_CONV_SHAPES = None


def _inception_conv_shapes() -> Dict[str, Tuple[int, int, int, int]]:
    """(out,in,kh,kw) for every BasicConv2d, derived from the module tree
    by tracing the flax model once with eval_shape."""
    global _INCEPTION_CONV_SHAPES
    if _INCEPTION_CONV_SHAPES is not None:
        return _INCEPTION_CONV_SHAPES
    import jax
    import jax.numpy as jnp

    from .inception import InceptionV3Features

    model = InceptionV3Features(resize_input=False)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 299, 299, 3))))
    out = {}

    def walk(tree, prefix):
        if "conv" in tree and "kernel" in tree["conv"]:
            kh, kw, i, o = tree["conv"]["kernel"].shape
            out[prefix] = (o, i, kh, kw)
            return
        for k, v in tree.items():
            walk(v, f"{prefix}.{k}" if prefix else k)

    walk(shapes["params"], "")
    _INCEPTION_CONV_SHAPES = out
    return out


def random_inception_state_dict(seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    sd = {}
    for name, (o, i, kh, kw) in _inception_conv_shapes().items():
        sd[f"{name}.conv.weight"] = rng.standard_normal(
            (o, i, kh, kw)).astype(np.float32) * (1.0 / np.sqrt(i * kh * kw))
        sd[f"{name}.bn.weight"] = (
            1.0 + 0.1 * rng.standard_normal(o)).astype(np.float32)
        sd[f"{name}.bn.bias"] = (0.1 * rng.standard_normal(o)).astype(
            np.float32)
        sd[f"{name}.bn.running_mean"] = (
            0.1 * rng.standard_normal(o)).astype(np.float32)
        sd[f"{name}.bn.running_var"] = np.abs(
            1.0 + 0.1 * rng.standard_normal(o)).astype(np.float32)
    return sd
