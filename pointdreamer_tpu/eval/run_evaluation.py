"""Texture-quality evaluation driver.

Reference: data/run_evaluation.py (RenderedImageDataset pairing GT/pred
renders, Tester computing LPIPS/FID/PSNR/SSIM, results appended to
*_eval_result.txt).  Here: paired PNG directories -> PSNR/SSIM (batched
jnp), optional FID via caller-provided feature extractor (pretrained
Inception weights are not available offline — see metrics.fid_from_features).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..core import io as pio
from . import metrics as M


def evaluate_image_dirs(gt_dir: str, pred_dir: str,
                        feature_fn=None,
                        out_file: Optional[str] = None) -> Dict[str, float]:
    names = sorted(f for f in os.listdir(gt_dir) if f.endswith(".png"))
    gt, pred = [], []
    for n in names:
        p = os.path.join(pred_dir, n)
        if not os.path.exists(p):
            continue
        gt.append(pio.load_rgb(os.path.join(gt_dir, n)))
        pred.append(pio.load_rgb(p))
    if not gt:
        raise FileNotFoundError("no paired PNGs between dirs")
    gt_j = jnp.asarray(np.stack(gt))
    pr_j = jnp.asarray(np.stack(pred))
    res = {
        "n_images": len(gt),
        "psnr": float(np.asarray(M.psnr(pr_j, gt_j)).mean()),
        "ssim": float(np.asarray(M.ssim(pr_j, gt_j)).mean()),
    }
    if feature_fn is not None:
        res["fid"] = M.fid_from_features(
            np.asarray(feature_fn(gt_j)), np.asarray(feature_fn(pr_j)))
    if out_file:
        with open(out_file, "a") as f:  # append like run_evaluation.py:361
            f.write(f"{pred_dir}: {res}\n")
    return res


def evaluate_geometry(pred_obj: str, gt_obj: str,
                      n_samples: int = 100000) -> Dict[str, float]:
    """MeshEvaluator protocol (models/POCO/eval/src/eval.py:28-90)."""
    mp = pio.load_obj(pred_obj)
    mg = pio.load_obj(gt_obj)
    pp, pn = M.sample_mesh_surface(mp["vertices"], mp["faces"], n_samples)
    gp, gn = M.sample_mesh_surface(mg["vertices"], mg["faces"], n_samples)
    res = M.chamfer_and_fscore(pp, pn, gp, gn)
    res["iou"] = M.mesh_iou(mp["vertices"], mp["faces"],
                            mg["vertices"], mg["faces"])
    return res
