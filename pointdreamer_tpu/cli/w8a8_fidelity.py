"""On-device w8a8 fidelity measurement for the REAL 552M-param UNet.

The tiny-UNet CPU gates (tests/test_diffusion.py) pin the w8a8 math; this
tool closes the scale gap: it runs the flagship imagenet256 architecture
(guided-diffusion 552M, the model of models/DDNM/guided_diffusion/
unet.py:396) on the REAL pipeline sparse view images of a demo cloud and
records PSNR/corr of the int8 samplers against the bf16 sampler on the
same noise stream — the fidelity stakes of the reference's
diffusion.py:459-570.  The static-scale leg calibrates on a DIFFERENT
shape (--calib_pc) to exercise the production calibrate-once pattern.

No pretrained checkpoint ships with the reference, so the UNet runs with
seeded random weights: quantization error is weight-distribution
dependent, not semantics dependent, and random fan-in-scaled weights are
the same distribution class the converters produce.

    python -m pointdreamer_tpu.cli.w8a8_fidelity \\
        --pc_file /root/reference/dataset/demo_data/clock.ply \\
        --calib_pc /root/reference/dataset/demo_data/rolling_lion.ply \\
        --out docs/w8a8_flagship_fidelity_r05.json
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _sparse_views(cfg, pc_file):
    """Run the real pipeline up to the sparse images (geometry ->
    project) and return (sparse_imgs [V,res,res,3], hard_mask0 [V,res,res])."""
    import jax.numpy as jnp

    from ..core.camera import make_camera_rig

    cache = os.path.join("/tmp", "pd_w8a8_views_"
                         + os.path.basename(pc_file) + f"_{cfg.res}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["imgs"], z["masks"]

    rig = make_camera_rig(cfg.view_num, cfg.cam_distance, cfg.cam_res,
                          cfg.cam_fov_deg, cfg.camera_distribution)

    from ..core import io as pio
    from ..pipeline import project as pproject
    from ..pipeline.pipeline import _pad_mesh, _pad_points
    from ..pipeline import geometry as pgeo

    xyz, rgb = pio.read_ply_xyzrgb(pc_file)
    xyz_n, _, _ = pgeo.normalize_points(xyz)
    verts, faces = pgeo.reconstruct_mesh(
        xyz_n, "SPR", cfg.grid_res, cfg.target_face_num, None, None,
        iso_method=cfg.iso_method, screen_weight=cfg.spr_screen_weight)
    verts_p, faces_p, _, _ = _pad_mesh(verts, faces)
    xyz_p, colors_p, point_mask = _pad_points(
        xyz_n, rgb.astype(np.float32) / 255.0)
    proj = pproject.project_views(
        rig, jnp.asarray(verts_p), jnp.asarray(faces_p),
        jnp.asarray(xyz_p), crop=cfg.crop_img, padding=cfg.crop_padding,
        depth_offset=cfg.depth_offset)
    proj = proj._replace(point_validation=proj.point_validation
                         & jnp.asarray(point_mask)[None, :])
    if cfg.point_validation_by_o3d:
        proj = pproject.add_hpr_visibility(
            proj, xyz_n, rig, cfg.hidden_point_removal_radius,
            n_total=len(xyz_p), depth_guard=cfg.hpr_depth_guard)
    sparse = pproject.make_sparse_images(
        proj, jnp.asarray(colors_p), cfg.res, cfg.point_size,
        cfg.edge_point_size, cfg.mask_ratio_thresh)
    out = (np.asarray(sparse.sparse_imgs),
           np.asarray(sparse.hard_mask0).astype(np.float32))
    np.savez(cache, imgs=out[0], masks=out[1])
    return out


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pc_file",
                    default="/root/reference/dataset/demo_data/clock.ply")
    ap.add_argument("--calib_pc",
                    default="/root/reference/dataset/demo_data/"
                            "rolling_lion.ply")
    ap.add_argument("--out", default="docs/w8a8_flagship_fidelity_r05.json")
    ap.add_argument("--t_sampling", type=int, default=100)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--fp32_floor", action="store_true",
                    help="also run an fp32 sampler and record the bf16 "
                         "sampler's own divergence from it — the "
                         "precision noise floor that contextualizes the "
                         "int8 numbers (the 100-step loop compounds "
                         "per-step rounding into trajectory divergence)")
    ap.add_argument("--calib_margin", type=float, default=None,
                    help="override DDNMInpainter's static-scale margin")
    args = ap.parse_args(argv)

    os.environ.setdefault("PD_ALLOW_RANDOM_DIFFUSION", "1")
    from ..core.config import PipelineConfig
    from ..core.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from ..models.diffusion import load_inpainter
    from ..models.diffusion.ddnm import ddnm_inpaint_batch
    from ..models.diffusion.unet import quantize_unet_params

    cfg = PipelineConfig(output_path="/tmp/pd_w8a8_fid")
    cfg.geo_from = "SPR"
    t0 = time.time()
    imgs, masks = _sparse_views(cfg, args.pc_file)
    calib_imgs, calib_masks = _sparse_views(cfg, args.calib_pc)
    print(f"sparse views ready ({time.time()-t0:.1f}s)", flush=True)

    # flagship bf16 inpainter (random weights, seeded) + int8 twins.
    # guided-diffusion ZERO-initializes the final out conv (and every
    # block's out projection): with untouched random init eps==0 and all
    # samplers are bit-identical — a vacuous comparison (the first run of
    # this tool measured PSNR 120 everywhere).  Perturb every matrix
    # leaf deterministically (the tiny-UNet gates' recipe) so signal
    # flows through all 552M params.
    from ..models.diffusion import DDNMInpainter
    from ..models.diffusion.unet import imagenet256_unet

    inp = load_inpainter(None, logger=None, quant_int8=False)
    model_fp = inp.model

    def _perturb(p):
        if p.ndim < 2:
            return p
        wave = jnp.sign(jnp.sin(
            jnp.arange(p.size, dtype=jnp.float32)).reshape(p.shape) + 0.1)
        return (p.astype(jnp.float32) + 0.02 * wave).astype(p.dtype)

    params_fp = jax.tree_util.tree_map(_perturb, inp.params)
    key = jax.random.PRNGKey(args.seed)

    out_fp = np.asarray(ddnm_inpaint_batch(
        model_fp, params_fp, jnp.asarray(imgs), jnp.asarray(masks), key,
        t_sampling=args.t_sampling))
    print(f"bf16 sampler done ({time.time()-t0:.1f}s)", flush=True)

    floor = None
    if args.fp32_floor:
        out_32 = np.asarray(ddnm_inpaint_batch(
            imagenet256_unet(dtype=jnp.float32), params_fp,
            jnp.asarray(imgs), jnp.asarray(masks), key,
            t_sampling=args.t_sampling))
        floor = {
            "bf16_psnr_vs_fp32": round(psnr(out_fp, out_32), 2),
            "bf16_corr_vs_fp32": round(float(np.corrcoef(
                out_fp.ravel(), out_32.ravel())[0, 1]), 5),
            "per_view_psnr": [round(psnr(out_fp[i], out_32[i]), 2)
                              for i in range(len(imgs))],
        }
        print(f"fp32 floor done ({time.time()-t0:.1f}s): "
              f"{floor['bf16_psnr_vs_fp32']} dB", flush=True)

    qmodel = imagenet256_unet(quant=True)
    qparams = quantize_unet_params(params_fp)

    out_dyn = np.asarray(ddnm_inpaint_batch(
        qmodel, qparams, jnp.asarray(imgs), jnp.asarray(masks), key,
        t_sampling=args.t_sampling))
    print(f"int8-dynamic sampler done ({time.time()-t0:.1f}s)", flush=True)

    stat = DDNMInpainter(qmodel, qparams, t_sampling=args.t_sampling,
                         seed=args.seed, static_calib=True)
    if args.calib_margin:
        stat.calib_margin = args.calib_margin
    stat.inpaint(jnp.asarray(calib_imgs), jnp.asarray(calib_masks),
                 key)                       # calibrate on the OTHER shape
    out_stat = np.asarray(stat.inpaint(jnp.asarray(imgs),
                                       jnp.asarray(masks), key))
    print(f"int8-static sampler done ({time.time()-t0:.1f}s)", flush=True)

    known = np.broadcast_to(masks[..., None].astype(bool), out_fp.shape)
    res = {
        "model": "imagenet256 guided-diffusion UNet, 552.8M params, "
                 "seeded random weights (no checkpoint ships)",
        "shape": os.path.basename(args.pc_file),
        "calib_shape": os.path.basename(args.calib_pc),
        "t_sampling": args.t_sampling,
        "views": int(imgs.shape[0]),
        "res": int(imgs.shape[1]),
        "int8_dynamic": {
            "psnr_vs_bf16": round(psnr(out_dyn, out_fp), 2),
            "psnr_known_region": round(psnr(out_dyn[known],
                                            out_fp[known]), 2),
            "corr": round(float(np.corrcoef(out_dyn.ravel(),
                                            out_fp.ravel())[0, 1]), 5),
            "per_view_psnr": [round(psnr(out_dyn[i], out_fp[i]), 2)
                              for i in range(len(imgs))],
        },
        "int8_static": {
            "psnr_vs_bf16": round(psnr(out_stat, out_fp), 2),
            "psnr_known_region": round(psnr(out_stat[known],
                                            out_fp[known]), 2),
            "corr": round(float(np.corrcoef(out_stat.ravel(),
                                            out_fp.ravel())[0, 1]), 5),
            "per_view_psnr": [round(psnr(out_stat[i], out_fp[i]), 2)
                              for i in range(len(imgs))],
            "psnr_vs_dynamic": round(psnr(out_stat, out_dyn), 2),
        },
        "fp32_floor": floor,
        "calib_margin": stat.calib_margin,
        "gates": {"full_image_min_db": 28.0, "corr_min": 0.99},
        "device": str(jax.devices()[0]),
        "wall_sec": round(time.time() - t0, 1),
    }
    assert res["int8_dynamic"]["psnr_vs_bf16"] < 119.0, (
        "int8 and bf16 samplers bit-identical — the comparison is "
        "vacuous (zero-init out convs?)")
    ok = (res["int8_static"]["psnr_vs_bf16"] >= 28.0
          and res["int8_static"]["corr"] >= 0.99)
    res["gates_pass"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
    print("wrote", args.out, "gates_pass:", ok)


if __name__ == "__main__":
    main()
