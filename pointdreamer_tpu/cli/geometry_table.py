"""Geometry-quality table over the demo clouds: each non-learned
reconstruction backend scored against the input scan.

The reference ships no GT meshes for its demo data, so the scan itself
is the measurement target (the same convention its MeshEvaluator uses
when pointcloud GT is all there is — models/POCO/eval/src/eval.py:28-90):
sample the reconstructed surface and report symmetric chamfer-L1,
F-score @0.01, normal consistency and Hausdorff against the input
points + their PCA normals.

    python -m pointdreamer_tpu.cli.geometry_table \\
        --data /root/reference/dataset/demo_data --out /tmp/geom_table.json

Prints a markdown table and writes the JSON.  Backends: SPR (screened
FFT-Poisson), hoppe, NKSR (biharmonic kernel field).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def score_mesh(verts, faces, gt_pts, gt_nrm, n_sample=100000):
    from ..eval.metrics import (chamfer_and_fscore, hausdorff,
                                sample_mesh_surface)

    samp, samp_n = sample_mesh_surface(verts, faces, n_sample, seed=0)
    m = chamfer_and_fscore(samp, samp_n, gt_pts, gt_nrm)
    m.update(hausdorff(samp, gt_pts))
    m["n_verts"], m["n_faces"] = int(len(verts)), int(len(faces))
    return m


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/dataset/demo_data")
    ap.add_argument("--out", default="/tmp/geom_table.json")
    ap.add_argument("--grid_res", type=int, default=128)
    ap.add_argument("--target_faces", type=int, default=10000)
    ap.add_argument("--backends", nargs="+",
                    default=["SPR", "hoppe", "NKSR"])
    args = ap.parse_args(argv)

    from ..core import io as pio
    from ..core.runtime import setup_jax
    from ..ops.sdf import estimate_oriented_normals
    from ..pipeline.geometry import normalize_points, reconstruct_mesh

    setup_jax()

    plys = sorted(p for p in os.listdir(args.data) if p.endswith(".ply"))
    results = {}
    for ply in plys:
        name = os.path.splitext(ply)[0]
        xyz, _ = pio.read_ply_xyzrgb(os.path.join(args.data, ply))
        xyz_n, _, _ = normalize_points(xyz)
        gt_nrm = np.asarray(estimate_oriented_normals(
            xyz_n.astype(np.float32)))
        results[name] = {}
        for backend in args.backends:
            t0 = time.time()
            if backend == "NKSR":
                from ..baselines.nksr import recon_one_shape_NKSR
                v, f, _ = recon_one_shape_NKSR(
                    xyz_n.astype(np.float32), None,
                    grid_res=args.grid_res,
                    simplify_face_num=args.target_faces)
            else:
                v, f = reconstruct_mesh(
                    xyz_n.astype(np.float32), backend,
                    grid_res=args.grid_res,
                    target_faces=args.target_faces)
            m = score_mesh(v, f, xyz_n.astype(np.float32), gt_nrm)
            m["recon_sec"] = round(time.time() - t0, 3)
            results[name][backend] = m
            print(f"{name:14s} {backend:6s} chamfer {m['chamfer_l1']:.5f} "
                  f"f@.01 {m['fscore']:.3f} nc {m['normal_consistency']:.3f}"
                  f" hausdorff {m['hausdorff']:.4f}  {m['recon_sec']}s")

    # markdown table (means over shapes)
    print("\n| backend | chamfer-L1 | F@0.01 | normal-cons | Hausdorff |")
    print("|---|---|---|---|---|")
    for backend in args.backends:
        ms = [results[n][backend] for n in results]
        print(f"| {backend} "
              f"| {np.mean([m['chamfer_l1'] for m in ms]):.5f} "
              f"| {np.mean([m['fscore'] for m in ms]):.3f} "
              f"| {np.mean([m['normal_consistency'] for m in ms]):.3f} "
              f"| {np.mean([m['hausdorff'] for m in ms]):.4f} |")

    with open(args.out, "w") as fo:
        json.dump(results, fo, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
