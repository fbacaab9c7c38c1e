"""Golden oracles: run the REFERENCE's own torch pipeline math on CPU.

The reference modules import kaolin/nvdiffrast/open3d at module level
(unavailable here), so we AST-extract just the named pure-torch functions
from /root/reference sources and exec them with:
  - the real libraries they use that ARE installed (torch, numpy, scipy,
    cv2),
  - two documented shims for CUDA-only library calls:
      * kal.metrics.pointcloud.sided_distance -> exact torch.cdist NN
        (identical math; the kaolin CUDA kernel computes the same
        squared-L2 nearest neighbor),
      * torchvision transforms Resize/Pad -> F.interpolate + F.pad
        (used only on the shrink-to-fit foreground mask).

This executes reference code verbatim as a numerical oracle — it is NOT
part of the shipped framework, and the sources are treated as untrusted
data (functions are extracted by name; no module-level code runs).
"""
from __future__ import annotations

import ast
import math
import os

import numpy as np
import torch
import torch.nn.functional as F
from scipy.interpolate import griddata

REF = "/root/reference"


def _extract(relpath: str, names):
    with open(os.path.join(REF, relpath)) as f:
        tree = ast.parse(f.read())
    body = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in set(names)]
    got = {n.name for n in body}
    assert got == set(names), f"missing {set(names) - got} in {relpath}"
    mod = ast.Module(body=body, type_ignores=[])
    ast.fix_missing_locations(mod)
    return compile(mod, os.path.join(REF, relpath), "exec")


class _SidedDistance:
    """kaolin.metrics.pointcloud.sided_distance shim (exact squared-L2 NN)."""

    @staticmethod
    def sided_distance(p1, p2):
        d = torch.cdist(p1.float(), p2.float()) ** 2
        dist, idx = d.min(dim=2)
        return dist, idx


class _Kal:
    class metrics:
        pointcloud = _SidedDistance


class _Resize:
    def __init__(self, size):
        self.size = tuple(size) if not isinstance(size, int) else (size, size)

    def __call__(self, x):
        y = F.interpolate(x.float().unsqueeze(0), size=self.size,
                          mode="nearest").squeeze(0)
        return y


class _Pad:
    """torchvision Pad semantics for a 2-tuple: (horizontal, vertical),
    applied to both sides."""

    def __init__(self, padding, fill=0):
        if isinstance(padding, int):
            padding = (padding, padding)
        self.ph, self.pv = int(padding[0]), int(padding[1])
        self.fill = fill

    def __call__(self, x):
        return F.pad(x, (self.ph, self.ph, self.pv, self.pv),
                     value=self.fill)


class _Compose:
    def __init__(self, ops):
        self.ops = ops

    def __call__(self, x):
        for op in self.ops:
            x = op(x)
        return x


class _Transforms:
    Resize = _Resize
    Pad = _Pad
    Compose = _Compose


def load_oracles():
    """Returns a namespace dict with the extracted reference functions."""
    ns = {
        "torch": torch, "np": np, "F": F, "os": os, "math": math,
        "griddata": griddata, "kal": _Kal, "transforms": _Transforms,
        "cv2": None,  # referenced only in dead/vis branches
    }
    exec(_extract("utils/utils_2d.py",
                  ["detect_edges_in_gray_by_scharr_torch_batch",
                   "dilate_torch_batch"]), ns)
    exec(_extract("pointdreamer/ours_utils.py",
                  ["paint_pixels", "get_forground_inner_edge_mask",
                   "naive_inpainting", "get_one_sparse_img"]), ns)
    exec(_extract("pointdreamer/unproject.py",
                  ["get_shrinked_per_view_per_pixel_visibility_torch",
                   "dilate_atlas"]), ns)
    return ns
