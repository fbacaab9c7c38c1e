"""Texture-metric evaluation CLI.

Reference: data/run_evaluation.py (:330-372) — pair GT/pred render dirs,
compute PSNR/SSIM (+FID given a feature extractor), append results to
*_eval_result.txt.

    python -m pointdreamer_tpu.cli.run_evaluation --gt_root g/ \
        --pred_root p/ [--out eval_result.txt]
"""
import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser("run_evaluation")
    ap.add_argument("--gt_root", required=True)
    ap.add_argument("--pred_root", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ..eval.run_evaluation import evaluate_image_dirs

    totals = {}
    n = 0
    for name in sorted(os.listdir(args.pred_root)):
        gt = os.path.join(args.gt_root, name)
        pred = os.path.join(args.pred_root, name)
        if not (os.path.isdir(gt) and os.path.isdir(pred)):
            continue
        m = evaluate_image_dirs(gt, pred, out_file=args.out)
        print(name, json.dumps(m))
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + v
        n += 1
    if n:
        print("MEAN", json.dumps({k: v / n for k, v in totals.items()}))


if __name__ == "__main__":
    main()
