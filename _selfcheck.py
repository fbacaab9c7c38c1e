import glob, json, os
from pointdreamer_tpu.eval.run_evaluation import texture_self_psnr
pairs = []
for ply in sorted(glob.glob('dataset/demo_data/*.ply')) + sorted(glob.glob('dataset/NBF_demo_data/*.ply')):
    name = os.path.splitext(os.path.basename(ply))[0]
    obj = f'output_batch/{name}/models/model_normalized.obj'
    if os.path.exists(obj):
        m = texture_self_psnr(obj, ply)
        print(name, json.dumps({k: round(v,3) for k,v in m.items()}), flush=True)
