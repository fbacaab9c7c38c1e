"""Geometry-evaluation CLI.

Reference: models/POCO/eval_meshes.py (:17-60): walk generated
model_normalized.obj files, score each against its GT mesh with the
MeshEvaluator protocol, print/append a results table.

    python -m pointdreamer_tpu.cli.eval_meshes --pred_root out/ \
        --gt_root gt_meshes/ [--out results.txt]
"""
import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser("eval_meshes")
    ap.add_argument("--pred_root", required=True)
    ap.add_argument("--gt_root", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n_samples", type=int, default=100000)
    args = ap.parse_args()

    from ..eval.run_evaluation import evaluate_geometry

    rows = []
    for name in sorted(os.listdir(args.pred_root)):
        pred = os.path.join(args.pred_root, name, "models",
                            "model_normalized.obj")
        gt = os.path.join(args.gt_root, name, "models",
                          "model_normalized.obj")
        if not os.path.exists(gt):
            gt = os.path.join(args.gt_root, name + ".obj")
        if not (os.path.exists(pred) and os.path.exists(gt)):
            continue
        m = evaluate_geometry(pred, gt, args.n_samples)
        m["name"] = name
        rows.append(m)
        print(json.dumps(m))
    if rows and args.out:
        keys = [k for k in rows[0] if k != "name"]
        mean = {k: sum(r[k] for r in rows) / len(rows) for k in keys}
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps({"name": "MEAN", **mean}) + "\n")
        print(json.dumps({"name": "MEAN", **mean}))


if __name__ == "__main__":
    main()
