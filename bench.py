"""Benchmark: end-to-end seconds/shape on the real TPU chip.

Runs the full pipeline (nearest-fill texture path — the configuration that
needs no pretrained checkpoints, reference configs/nearest.yaml) on the
reference demo cloud clock.ply at full resolutions (8 views @ 512^2,
atlas 1024^2, 128^3 geometry grid), one warmup run for compilation, then
a timed run with all stage caches cleared.

Prints ONE JSON line: sec/shape and the ratio vs the reference's ~60 s on
an NVIDIA A100 (Readme.md:24; BASELINE.md).
"""
import json
import os
import shutil
import sys
import time


def run_once(pipe, out_dir, tag):
    from pointdreamer_tpu.core.log import StageTimer

    timer = StageTimer(logger=None, sync=True)
    pipe.recon_one_textured_mesh(
        "/root/reference/dataset/demo_data/clock.ply", tag, timer)
    return timer


def main():
    from pointdreamer_tpu.core.config import load_config
    from pointdreamer_tpu.pipeline.pipeline import Pipeline

    out_dir = "/tmp/pd_bench_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = load_config(os.path.join(os.path.dirname(__file__) or ".",
                                   "configs", "nearest.yaml"))
    cfg.output_path = out_dir
    cfg.geo_from = "SPR"  # FFT-Poisson backend (no POCO checkpoint ships with the reference)
    cfg.save_input_pc = False
    pipe = Pipeline.create(cfg)

    run_once(pipe, out_dir, "warmup")          # compile
    shutil.rmtree(out_dir, ignore_errors=True)  # drop stage caches
    t0 = time.time()
    timer = run_once(pipe, out_dir, "timed")
    sec = time.time() - t0

    baseline_a100 = 60.0  # reference end-to-end sec/shape on A100
    detail = {k: round(v, 3) for k, v in timer.times.items()}

    # opt-in secondary metric (PD_BENCH_THROUGHPUT=1): batch throughput
    # over all four demo clouds with two shapes in flight (run_dataset
    # concurrency mode) — one shape's host stages overlap the other's
    # device dispatches.  Off by default: the three extra shapes are new
    # point-count buckets, and on axon (no persistent compile cache)
    # their cold compiles would triple the bench wall time.
    if os.environ.get("PD_BENCH_THROUGHPUT") == "1":
        from pointdreamer_tpu.pipeline.batch import run_dataset

        demo_dir = "/root/reference/dataset/demo_data"
        plys = sorted(os.path.join(demo_dir, p)
                      for p in os.listdir(demo_dir) if p.endswith(".ply"))
        shutil.rmtree(out_dir, ignore_errors=True)
        run_dataset(cfg, plys, concurrency=2)   # warm new shape buckets
        shutil.rmtree(out_dir, ignore_errors=True)
        t1 = time.time()
        res = run_dataset(cfg, plys, concurrency=2)
        tput = (time.time() - t1) / max(len(plys), 1)
        detail["throughput_sec_per_shape"] = round(tput, 3)
        detail["throughput_shapes_ok"] = sum(
            r["status"] == "ok" for r in res.values())

    print(json.dumps({
        "metric": "sec_per_shape_e2e",
        "value": round(sec, 3),
        "unit": "s",
        "vs_baseline": round(baseline_a100 / sec, 2),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
