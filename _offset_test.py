import json, shutil
from pointdreamer_tpu.core.config import load_config
from pointdreamer_tpu.pipeline.pipeline import Pipeline
from pointdreamer_tpu.eval.run_evaluation import texture_self_psnr
for off in (3e-3, 1e-3):
    cfg = load_config('configs/nearest.yaml')
    cfg.geo_from='SPR'; cfg.output_path=f'output_off{off}'; cfg.depth_offset=off
    cfg.save_input_pc=False
    pipe = Pipeline.create(cfg)
    obj = pipe.recon_one_textured_mesh('dataset/demo_data/clock.ply','clock')
    m = texture_self_psnr(obj, 'dataset/demo_data/clock.ply')
    print(off, json.dumps({k: round(v,3) for k,v in m.items()}), flush=True)
