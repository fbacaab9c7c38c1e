"""PointDreamer-TPU demo CLI.

Same public surface as the reference (demo.py:475-497):

    python demo.py --config configs/default.yaml --pc_file X.ply
    python demo.py --config configs/nearest.yaml --pc_file dataset_dir/

emits output/<name>/models/model_normalized.{obj,mtl,png}.
"""
import argparse
import datetime
import os
import shutil

import numpy as np


def main():
    parser = argparse.ArgumentParser("PointDreamer-TPU")
    parser.add_argument("--config", type=str, default="configs/default.yaml")
    parser.add_argument("--pc_file", type=str,
                        default="dataset/demo_data/clock.ply")
    parser.add_argument("--concurrency", type=int, default=1,
                        help="shapes in flight for directory inputs: >1 "
                             "overlaps one shape's host stages with "
                             "another's device stages (throughput mode)")
    args = parser.parse_args()

    from pointdreamer_tpu.core.config import load_config
    from pointdreamer_tpu.pipeline.pipeline import Pipeline

    cfg = load_config(args.config)
    os.makedirs(cfg.output_path, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y.%m.%d.%H.%M.%S")
    pipe = Pipeline.create(
        cfg, log_file=os.path.join(cfg.output_path, f"{stamp}_log.log"))

    if args.pc_file.endswith(".ply"):
        pc_files = [args.pc_file]
    else:
        pc_files = sorted(
            os.path.join(args.pc_file, f)
            for f in os.listdir(args.pc_file) if f.endswith(".ply"))

    cfg_tag = os.path.splitext(os.path.basename(args.config))[0]

    def recon(pc_file):
        name = os.path.splitext(os.path.basename(pc_file))[0] + "_" + cfg_tag
        os.makedirs(os.path.join(cfg.output_path, name), exist_ok=True)
        shutil.copy(args.config,
                    os.path.join(cfg.output_path, name, "config.yaml"))
        pipe.logger.info(f"Start Recon {pc_file}...")
        pipe.recon_one_textured_mesh(pc_file, name)

    if args.concurrency > 1 and len(pc_files) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.concurrency,
                                thread_name_prefix="pd-shape") as ex:
            list(ex.map(recon, pc_files))
    else:
        for pc_file in pc_files:
            recon(pc_file)


if __name__ == "__main__":
    main()
