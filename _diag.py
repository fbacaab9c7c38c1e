import numpy as np
import jax.numpy as jnp
from pointdreamer_tpu.core.io import load_obj, load_rgb, read_ply_xyzrgb
from pointdreamer_tpu.pipeline.geometry import normalize_points
from pointdreamer_tpu.pipeline.unwrap import bake_atlas
from pointdreamer_tpu.ops.knn import knn

obj = 'output_batch/clock/models/model_normalized.obj'
m = load_obj(obj)
atlas = load_rgb(obj.replace('.obj', '.png'))[::-1].copy()
R = atlas.shape[0]
baked = bake_atlas(jnp.asarray(m['vertices']), jnp.asarray(m['faces']),
                   m['uvs'], m['face_uv_idx'], R)
mask = np.asarray(baked['mask'])
gb = np.asarray(baked['gb_pos'])[mask]
tex = atlas[mask]
xyz, rgb = read_ply_xyzrgb('dataset/demo_data/clock.ply')
xyz_n, _, _ = normalize_points(xyz)
rgb01 = rgb.astype(np.float32) / 255.
d, i = knn(jnp.asarray(xyz_n), jnp.asarray(gb), 1)
d = np.sqrt(np.asarray(d)[:, 0])
i = np.asarray(i)[:, 0]
near = d < 0.02
err = np.abs(tex[i[near]] - rgb01[near]).mean(1)
print('err quantiles', np.percentile(err, [50, 75, 90, 95, 99]).round(3).tolist(), flush=True)
print('frac err>0.2:', float((err > 0.2).mean()), flush=True)
print('corr err vs texel-dist:', float(np.corrcoef(err, d[near])[0, 1]), flush=True)
print('atlas covered frac:', float(mask.mean()), flush=True)
print('atlas mean', tex.mean(0).round(3).tolist(), 'input mean', rgb01.mean(0).round(3).tolist(), flush=True)
# error vs position height (clock face vs body)
pts = xyz_n[near]
hi = err > 0.2
print('high-err centroid', pts[hi].mean(0).round(3).tolist(), 'all centroid', pts.mean(0).round(3).tolist(), flush=True)
print('high-err |z| mean', float(np.abs(pts[hi][:, 2]).mean()), 'vs all', float(np.abs(pts[:, 2]).mean()), flush=True)
