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
                        feature_fn=None, lpips_fn=None,
                        out_file: Optional[str] = None) -> Dict[str, float]:
    """PSNR/SSIM always; FID when `feature_fn` (e.g.
    perception.load_inception_features) and LPIPS when `lpips_fn`
    (perception.load_lpips) are supplied — the full protocol of
    data/run_evaluation.py:110-372."""
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
    if lpips_fn is not None:
        res["lpips"] = float(np.asarray(lpips_fn(pr_j, gt_j)).mean())
    if out_file:
        with open(out_file, "a") as f:  # append like run_evaluation.py:361
            f.write(f"{pred_dir}: {res}\n")
    return res


def texture_self_psnr(obj_path: str, pc_file: str,
                      atlas_res: Optional[int] = None) -> Dict[str, float]:
    """Self-consistency acceptance test: for every input point, look up
    the exported atlas color at its nearest covered texel (via the
    baked texel->3D map) and compare with the point's true color.
    Plays the role of the reference's texture-PSNR acceptance numbers
    when no GT renders exist."""
    import jax.numpy as jnp

    from ..core.io import load_obj, load_rgb, read_ply_xyzrgb
    from ..ops.knn import knn
    from ..pipeline.geometry import normalize_points
    from ..pipeline.unwrap import bake_atlas

    m = load_obj(obj_path)
    atlas = load_rgb(obj_path.replace(".obj", ".png"))[::-1].copy()
    R = atlas.shape[0]
    baked = bake_atlas(jnp.asarray(m["vertices"]), jnp.asarray(m["faces"]),
                       m["uvs"], m["face_uv_idx"], R)
    mask = np.asarray(baked["mask"])
    gb = np.asarray(baked["gb_pos"])[mask]
    tex_colors = atlas[mask]

    xyz, rgb = read_ply_xyzrgb(pc_file)
    xyz_n, _, _ = normalize_points(xyz)
    rgb01 = rgb.astype(np.float32) / 255.0

    d, i = knn(jnp.asarray(xyz_n), jnp.asarray(gb), 1)
    d = np.sqrt(np.asarray(d)[:, 0])
    near = d < 0.02  # points whose surface texel is identifiable
    got = tex_colors[np.asarray(i)[:, 0]][near]
    want = rgb01[near]
    mse = float(np.mean((got - want) ** 2))
    return {
        "points_matched": float(near.mean()),
        "mae": float(np.abs(got - want).mean()),
        "psnr": float(10 * np.log10(1.0 / max(mse, 1e-12))),
    }


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
