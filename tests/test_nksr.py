"""Kernel-field (NKSR-class) baseline: geometry + color field accuracy."""
import os

import numpy as np
import pytest


def _sphere_cloud(n=4000, r=0.4, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * r).astype(np.float32)
    # colors = a smooth function of position (x-hemisphere split)
    cols = np.stack([0.5 + pts[:, 0], 0.5 - pts[:, 0],
                     np.full(n, 0.25)], -1).astype(np.float32)
    return pts, np.clip(cols, 0, 1)


def test_kernel_field_sphere_geometry_and_color(tmp_path):
    from pointdreamer_tpu.baselines.nksr import recon_one_shape_NKSR

    pts, cols = _sphere_cloud()
    verts, faces, vcols = recon_one_shape_NKSR(
        pts, cols, grid_res=48, mise_iter=2, max_centers=512)
    assert len(verts) > 100 and len(faces) > 100
    assert vcols.shape == (len(verts), 3)

    # every mesh vertex should sit near the true r=0.4 sphere
    rad = np.linalg.norm(verts, axis=1)
    assert abs(np.mean(rad) - 0.4) < 0.02, np.mean(rad)
    assert np.percentile(np.abs(rad - 0.4), 95) < 0.04

    # mise refinement pulls vertices onto the continuous field: tighter
    # spread than the raw 48-grid cell (~0.025)
    assert np.std(rad) < 0.015

    # the PCNN-style color field reproduces the smooth input coloring
    expect = np.clip(np.stack([0.5 + verts[:, 0], 0.5 - verts[:, 0],
                               np.full(len(verts), 0.25)], -1), 0, 1)
    assert np.abs(vcols - expect).mean() < 0.05


def test_kernel_field_sign_convention():
    """Field must be positive outside / negative inside (pipeline
    marching-cubes convention)."""
    from pointdreamer_tpu.baselines.nksr import fit_kernel_field
    from pointdreamer_tpu.ops.sdf import estimate_oriented_normals

    pts, _ = _sphere_cloud(2000)
    nrm = estimate_oriented_normals(pts)
    field, centers = fit_kernel_field(pts, nrm, max_centers=256)
    # kernel nodes = on-surface subsample + eps-offset twins + far ring
    assert len(centers) <= 2 * 256 + 128
    q = np.array([[0, 0, 0], [0.55, 0, 0], [0, 0.55, 0]], np.float32)
    f = field(q)
    assert f[0] < 0 and f[1] > 0 and f[2] > 0, f


def test_nksr_cli_layout(tmp_path):
    """CLI writes the reference output layout (NKSR.py:144-189)."""
    from pointdreamer_tpu.cli.nksr_baseline import main
    from pointdreamer_tpu.core import io as pio

    pts, cols = _sphere_cloud(1500)
    ply = tmp_path / "toy.ply"
    pio.save_colored_pc_ply(pts, cols, str(ply))
    out = tmp_path / "out"
    main(["--pc_file", str(ply), "--output", str(out),
          "--grid_res", "32", "--mise_iter", "1", "--max_centers", "256"])
    obj = out / "toy" / "models" / "model_normalized.obj"
    assert obj.exists()
    assert (out / "toy" / "models" / "model_normalized.ply").exists()
    assert (out / "toy" / "input_pc.ply").exists()
    # vertex-colored obj: v lines carry 6 floats
    first_v = next(l for l in open(obj) if l.startswith("v "))
    assert len(first_v.split()) == 7
    # idempotent skip
    main(["--pc_file", str(ply), "--output", str(out)])
