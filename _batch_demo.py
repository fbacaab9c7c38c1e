import glob
import json
import time

from pointdreamer_tpu.core.config import load_config
from pointdreamer_tpu.pipeline.batch import run_dataset

cfg = load_config("configs/nearest.yaml")
cfg.geo_from = "SPR"
cfg.output_path = "output_batch"
files = sorted(glob.glob("dataset/demo_data/*.ply")) + sorted(
    glob.glob("dataset/NBF_demo_data/*.ply"))
t0 = time.time()
res = run_dataset(cfg, files)
print(json.dumps({k: v["status"] for k, v in res.items()}), flush=True)
print("total", round(time.time() - t0, 1), "s for", len(files), "shapes",
      flush=True)
