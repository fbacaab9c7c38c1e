"""Point2surf-protocol mesh evaluation CLI.

Reference: models/POCO/eval_point2surf_datasets.py +
eval/eval_point2surf/evaluation.py mesh_comparison (:306-360): pair every
generated mesh with the GT mesh of the same stem under <gtdir>/03_meshes,
sample 10k surface points each, and write
hausdorff_dist_pred_rec.csv with the directed Hausdorff distances (both
ways) and the chamfer distance.

    python -m pointdreamer_tpu.cli.eval_point2surf \
        --gendir out/ [--meshdir meshes] --gtdir dataset/abc
"""
import argparse
import csv
import os


def main():
    ap = argparse.ArgumentParser("eval_point2surf")
    ap.add_argument("--gendir", required=True)
    ap.add_argument("--meshdir", default="meshes")
    ap.add_argument("--gtdir", required=True)
    ap.add_argument("--samples", type=int, default=10000)
    args = ap.parse_args()

    from ..core import io as pio
    from ..eval import metrics as M

    pred_dir = os.path.join(args.gendir, args.meshdir)
    gt_dir = os.path.join(args.gtdir, "03_meshes")
    out_csv = os.path.join(args.gendir, "hausdorff_dist_pred_rec.csv")

    rows = []
    for fname in sorted(os.listdir(pred_dir)):
        stem = fname.split(".")[0]
        gt = None
        for ext in (".ply", ".obj"):
            cand = os.path.join(gt_dir, stem + ext)
            if os.path.exists(cand):
                gt = cand
                break
        if gt is None:
            continue
        mp = pio.load_obj(os.path.join(pred_dir, fname)) \
            if fname.endswith(".obj") else \
            pio.load_ply_mesh(os.path.join(pred_dir, fname))
        mg = pio.load_obj(gt) if gt.endswith(".obj") \
            else pio.load_ply_mesh(gt)
        pp, _ = M.sample_mesh_surface(mp["vertices"], mp["faces"],
                                      args.samples)
        gp, _ = M.sample_mesh_surface(mg["vertices"], mg["faces"],
                                      args.samples)
        h = M.hausdorff(pp, gp)
        import numpy as np

        from ..ops.knn import knn
        import jax.numpy as jnp

        d_pg = np.sqrt(np.maximum(np.asarray(
            knn(jnp.asarray(pp), jnp.asarray(gp), 1)[0][:, 0]), 0))
        d_gp = np.sqrt(np.maximum(np.asarray(
            knn(jnp.asarray(gp), jnp.asarray(pp), 1)[0][:, 0]), 0))
        chamfer = float(d_pg.mean() + d_gp.mean())
        rows.append([os.path.join(pred_dir, fname), gt,
                     chamfer, h["hausdorff_pred_gt"],
                     h["hausdorff_gt_pred"]])
        print(stem, "chamfer", round(chamfer, 6),
              "hausdorff", round(h["hausdorff"], 6))

    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["in_file", "ref_file", "chamfer_dist",
                    "hausdorff_new_ref", "hausdorff_ref_new"])
        w.writerows(rows)
    print("wrote", out_csv, f"({len(rows)} pairs)")


if __name__ == "__main__":
    main()
