import time, sys
from pointdreamer_tpu.core.config import load_config
from pointdreamer_tpu.core.log import StageTimer, get_logger
from pointdreamer_tpu.pipeline.pipeline import Pipeline
cfg = load_config('configs/nearest.yaml'); cfg.geo_from='hoppe'
pipe = Pipeline.create(cfg)
log = get_logger()
for run in range(2):
    t0=time.time()
    timer = StageTimer(None)
    pipe.recon_one_textured_mesh('dataset/demo_data/clock.ply','clock_nearest', timer)
    print(f'RUN{run} TOTAL', round(time.time()-t0,1), flush=True)
    print(timer.report(), flush=True)
