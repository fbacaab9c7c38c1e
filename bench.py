"""Benchmark: end-to-end seconds/shape on the real TPU chip.

Legs, all full resolutions (8 views @ 512^2, inpaint 256^2, atlas
1024^2, 128^3 geometry grid) on the reference demo cloud clock.ply:

  1. FLAGSHIP (headline): the full-diffusion pipeline — reference
     configs/default.yaml semantics with texture_gen_method DDNM_inpaint
     (100-step x 8-view DDNM denoise over the 552M-param guided-diffusion
     UNet) in bf16, the shipped default.  (w8a8 was the round-5
     candidate headline, but the on-device 552M record
     docs/w8a8_flagship_fidelity_r05.json measures the int8 sampler
     22.7 dB from bf16 against a 38.1 dB bf16-vs-fp32 precision floor,
     so int8 stays an opt-in detail leg.)  The reference spends ~90% of
     its ~60 s/shape (A100) here (Readme.md:24, diffusion.py:459-570), so
     this is the apples-to-apples number.  No pretrained checkpoint ships
     with the reference, so the UNet runs with random weights
     (PD_ALLOW_RANDOM_DIFFUSION=1): FLOPs and memory traffic are
     weight-independent, the cost is identical.
     The timed run repeats PD_BENCH_REPEATS times (default 3) with stage
     caches cleared between runs; `value` is the MEDIAN and min/max ride
     in `detail` so single-run tunnel/host variance stops moving the
     round artifact (round-4 lesson: one-shot timing swung ~1.7 s).
  2. w8a8 torso leg (ddnm_quant_int8 on; approximate quality, see
     above), in `detail`.
  3. nearest-fill path (reference configs/nearest.yaml, no neural nets),
     in `detail` — the round-1/2 headline, kept for trend.

Each leg does one warmup run for compilation first.  Prints ONE JSON
line; vs_baseline is the reference's ~60 s on an NVIDIA A100 divided by
the flagship median.
"""
import json
import os
import shutil
import time

os.environ.setdefault("PD_ALLOW_RANDOM_DIFFUSION", "1")


def run_once(pipe, out_dir, tag):
    from pointdreamer_tpu.core.log import StageTimer

    timer = StageTimer(logger=None, sync=True)
    pipe.recon_one_textured_mesh(
        "/root/reference/dataset/demo_data/clock.ply", tag, timer)
    return timer


def time_leg(cfg, out_dir, repeats=1):
    """warmup (compile) + `repeats` timed runs with cleared caches
    -> (sorted-by-time [(sec, timer), ...], pipe)."""
    from pointdreamer_tpu.pipeline.pipeline import Pipeline

    pipe = Pipeline.create(cfg)
    shutil.rmtree(out_dir, ignore_errors=True)
    run_once(pipe, out_dir, "warmup")           # compile
    runs = []
    for _ in range(repeats):
        shutil.rmtree(out_dir, ignore_errors=True)  # drop stage caches
        t0 = time.time()
        timer = run_once(pipe, out_dir, "timed")
        runs.append((time.time() - t0, timer))
    runs.sort(key=lambda r: r[0])
    return runs, pipe


def time_throughput(cfg, out_dir, plys, pipe,
                    concurrency=int(os.environ.get("PD_BENCH_CONC", "4"))):
    # concurrency default measured round 5 (int8 leg, v5e): 2 -> 10.42,
    # 3 -> 10.52, 4 -> 10.16 s/shape — the 1-core tunnel host needs a
    # deeper queue to keep the chip fed while it time-shares the host
    # singles (HPR hulls, LSCM, QEM, IO) across shapes.
    """Steady-state dataset throughput: REUSE the leg's Pipeline so the
    measurement excludes model init / weight quantization (setup, not
    throughput — round 3 re-created the Pipeline inside the timed window
    and reported ~+4 s/shape of pure setup as 'throughput')."""
    from pointdreamer_tpu.pipeline.batch import run_dataset

    shutil.rmtree(out_dir, ignore_errors=True)
    run_dataset(cfg, plys, concurrency=concurrency, pipe=pipe)   # warm
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    res = run_dataset(cfg, plys, concurrency=concurrency, pipe=pipe)
    sec = (time.time() - t0) / max(len(plys), 1)
    ok = sum(r["status"] == "ok" for r in res.values())
    return sec, ok


def main():
    from pointdreamer_tpu.core.config import load_config

    t_start = time.time()
    out_dir = "/tmp/pd_bench_out"
    cfg_dir = os.path.join(os.path.dirname(__file__) or ".", "configs")
    repeats = int(os.environ.get("PD_BENCH_REPEATS", "3"))

    # ---- leg 1: flagship full-diffusion bf16 (default.yaml) ------------
    cfg = load_config(os.path.join(cfg_dir, "default.yaml"))
    cfg.output_path = out_dir
    cfg.geo_from = "SPR"  # no POCO checkpoint ships with the reference
    cfg.save_input_pc = False
    assert not cfg.ddnm_quant_int8, "default.yaml ships the bf16 path"
    runs, pipe = time_leg(cfg, out_dir, repeats=repeats)
    times = [r[0] for r in runs]
    med_sec, med_timer = runs[len(runs) // 2]
    detail = {
        "quant": "bf16",
        "runs_sec": [round(t, 3) for t in times],
        "run_min_sec": round(times[0], 3),
        "run_max_sec": round(times[-1], 3),
    }
    detail.update({f"flagship_{k}": round(v, 3)
                   for k, v in med_timer.times.items()})
    # per-run geometry/inpaint splits: the r4 artifact had a 1.56 s
    # geometry outlier nobody could explain — keep the per-run evidence
    detail["runs_geometry"] = [round(r[1].times.get("geometry", 0), 3)
                               for r in runs]
    detail["runs_inpaint"] = [round(r[1].times.get("inpaint", 0), 3)
                              for r in runs]

    demo_dir = "/root/reference/dataset/demo_data"
    plys = sorted(os.path.join(demo_dir, p)
                  for p in os.listdir(demo_dir) if p.endswith(".ply"))

    # Optional legs respect a wall-clock budget (counted from process
    # start, so a cold leg-1 compile eats into it) so a cold run in a
    # time-limited harness still prints the headline JSON; skipped legs
    # are recorded as such.
    # 2200 s: the median-of-3 x {bf16, int8} x {latency, throughput}
    # program measured ~21 min warm on v5e; 1200 was the single-run
    # budget and would drop the int8 legs from the round record on a
    # cold driver run
    budget = float(os.environ.get("PD_BENCH_BUDGET_S", "2200"))

    def have_time():
        return time.time() - t_start < budget

    # ---- leg 1b: flagship THROUGHPUT over the 4 demo clouds -----------
    # Two shapes in flight (run_dataset concurrency): one shape's host
    # stages (LSCM unwrap, packing, IO) hide under the other's device-
    # bound DDNM scan.  All demo clouds share the 32768-point padding
    # bucket -> the warm pass reuses the leg-1 executables.
    if os.environ.get("PD_BENCH_SKIP_TPUT") != "1" and have_time():
        sec, ok = time_throughput(cfg, out_dir, plys, pipe)
        detail["throughput_sec_per_shape"] = round(sec, 3)
        detail["throughput_shapes_ok"] = ok

    # ---- leg 1a: w8a8 torso (ddnm_quant_int8 on; approximate) ----------
    if os.environ.get("PD_BENCH_SKIP_INT8") != "1" and have_time():
        cfg.ddnm_quant_int8 = True
        int8_runs, int8_pipe = time_leg(cfg, out_dir,
                                        repeats=min(repeats, 3))
        it = [r[0] for r in int8_runs]
        detail["int8_sec_per_shape"] = round(it[len(it) // 2], 3)
        detail["int8_runs_sec"] = [round(t, 3) for t in it]
        detail["int8_inpaint"] = round(
            int8_runs[len(it) // 2][1].times.get("inpaint", 0), 3)
        if os.environ.get("PD_BENCH_SKIP_TPUT") != "1" and have_time():
            sec, ok = time_throughput(cfg, out_dir, plys, int8_pipe)
            detail["int8_throughput_sec_per_shape"] = round(sec, 3)
            detail["int8_throughput_shapes_ok"] = ok
        cfg.ddnm_quant_int8 = False
        del int8_pipe
    if not have_time():
        detail["optional_legs_skipped_at_budget_s"] = budget

    # ---- leg 2: nearest-fill path (nearest.yaml) -----------------------
    cfg = load_config(os.path.join(cfg_dir, "nearest.yaml"))
    cfg.output_path = out_dir
    cfg.geo_from = "SPR"
    cfg.save_input_pc = False
    near_runs, near_pipe = time_leg(cfg, out_dir)
    near_sec, near_timer = near_runs[0]
    detail["nearest_path_sec"] = round(near_sec, 3)
    detail.update({f"nearest_{k}": round(v, 3)
                   for k, v in near_timer.times.items()})

    # opt-in (PD_BENCH_THROUGHPUT=1): nearest-path throughput too
    if os.environ.get("PD_BENCH_THROUGHPUT") == "1":
        sec, _ = time_throughput(cfg, out_dir, plys, near_pipe)
        detail["throughput_sec_per_shape_nearest"] = round(sec, 3)

    baseline_a100 = 60.0  # reference full-diffusion e2e sec/shape on A100
    print(json.dumps({
        "metric": "sec_per_shape_e2e_full_diffusion",
        "value": round(med_sec, 3),
        "unit": "s",
        "vs_baseline": round(baseline_a100 / med_sec, 2),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
