"""Typed configuration for the PointDreamer-TPU pipeline.

Mirrors the flat YAML key set of the reference configs
(/root/reference/configs/default.yaml and demo.py:315-316, which parse YAML
into an untyped Munch).  Here the config is a typed dataclass: unknown keys
are reported instead of silently ignored, and every stage function receives
the one `PipelineConfig` object rather than **cfg splats.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional

import yaml


@dataclass
class PipelineConfig:
    # ---- experiment / IO ------------------------------------------------
    exp_name: str = "default"
    output_path: str = "output"
    save_dir: str = "out_inference"
    save_input_pc: bool = True
    render_after_inference: bool = False

    # ---- input ----------------------------------------------------------
    dataset_name: str = "demo"
    input_already_noisy: bool = False
    noise_stddev: Optional[float] = None
    coords_scale: float = 1.0
    max_points: int = 30000  # reference demo.py:372-374 input budget

    # ---- geometry -------------------------------------------------------
    # 'POCO'   : implicit occupancy network (needs checkpoint)
    # 'SPR'    : screened-Poisson equivalent -> FFT Poisson reconstruction
    # 'hoppe'  : signed distance to tangent planes (non-learned, default
    #            when no POCO checkpoint is available)
    geo_from: str = "POCO"
    poco_checkpoint: Optional[str] = None
    # reference network_decoder config key (generate.py:305); variants in
    # models/occupancy/alt.DECODERS
    network_decoder: str = "InterpAttentionKHeadsNet"
    grid_res: int = 128           # reference models/POCO/generate_1.py:48
    target_face_num: int = 10000  # reference models/POCO/generate_1.py:49
    smooth_mesh: bool = False
    # iso-vertex bisection refinement iterations against the analytic
    # field (reference models/POCO/generate.py:177-273 refines x10;
    # grid-only backends like the FFT-Poisson field skip it)
    refine_vertex_iters: int = 10
    # iso-surface extraction: 'mc' = 256-case marching cubes (default —
    # the reference's extraction, generate.py:162; ~3x fewer triangles,
    # equal texture fidelity at full res: 31.08 vs 31.00 dB self-parity)
    # | 'tets' = 6-tet decomposition (scores ~2 dB better on the
    # REDUCED-res cube gate, where the fixed-texel seam width magnifies
    # chart-boundary error on sharp-edged shapes — a resolution
    # artifact, not a geometry one: sphere and full-res are equal)
    iso_method: str = "mc"
    # SPR screening term (Kazhdan & Hoppe 2013) strength for the
    # 'SPR'/'poisson_fft' backend, the reference's own model class
    # (baselines/spr.py runs pymeshlab screened-Poisson).  Default 2.0
    # with 48 CG iters — the round-5 sweep: demo-cloud mean F@0.01
    # 0.843 (sw=0) -> 0.895 (the open cup 0.468 -> 0.693, Hausdorff
    # better on every shape, normal-consistency ~0.97) while every
    # texture self-parity gate stays green (sw=4 scores 0.900 on the
    # scans but drops the sharp-edged full-res cube gate to 29.2 dB).
    # Costs ~+0.3 s of geometry on v5e.  0 = pure spectral solve.
    spr_screen_weight: float = 2.0

    # ---- texture generation ---------------------------------------------
    # 'DDNM_inpaint' | 'linear' | 'nearest'
    texture_gen_method: str = "DDNM_inpaint"
    diffusion_checkpoint: Optional[str] = None
    # shard the DDNM view batch over all local devices (dp) when the view
    # count divides the device count — TPU replacement for the reference's
    # torch DataParallel (diffusion.py:456)
    ddnm_data_parallel: bool = True
    # w8a8 UNet torso (int8 MXU passes, ~1.6x faster denoise loop on v5e);
    # quality is approximate — off by default for reference parity
    ddnm_quant_int8: bool = False
    # STATIC per-step w8a8 activation scales, calibrated from one
    # dynamic-scale trajectory on the first inpaint call (removes the
    # per-conv abs-max reduction pass; measured scan 8.93 -> 8.07 s on
    # v5e).  False = dynamic per-call scales.  Only meaningful with
    # ddnm_quant_int8.
    ddnm_quant_static: bool = True
    # GT-texture ablation (reference recon_one_shape's
    # use_GT_multi_view_img / load_exist_dense_img_path branches,
    # ours_utils.py:1046-1200): pre-rendered DENSE views replace the
    # inpainting stage; layout <dir>/{i}_inpainted.png (or <dir>/{i}.png).
    # The views must be in the pipeline's own view frame: same rig,
    # res x res, and crop_img: false (dense renders carry no shrink-to-fit
    # scale, so the pixel<->texel mapping must be the uncropped one).
    gt_views_path: Optional[str] = None

    # ---- cameras (reference configs/default.yaml:33-37) ------------------
    camera_distribution: str = "fibonacci_sphere"
    cam_res: int = 512
    view_num: int = 8
    cam_distance: float = 1.6
    cam_fov_deg: float = 45.0

    # ---- inpainting images (reference configs/default.yaml:39-42) --------
    res: int = 256
    point_size: int = 1
    edge_point_size: int = 1
    # reject HPR-rescued points more than this far behind the rasterized
    # surface (0 = the reference's plain logical_or, demo.py:110)
    hpr_depth_guard: float = 0.03

    # ---- visibility ------------------------------------------------------
    point_validation_by_o3d: bool = True   # spherical-flip hidden point removal
    hidden_point_removal_radius: float = 100.0
    refine_point_validation_by_remove_abnormal_depth: bool = False
    refine_res: int = 512
    depth_offset: float = 1e-2  # z-test tolerance in linear view depth
                                # (reference uses 1e-4 in NDC z; demo.py:107)

    # ---- crop / rescale (reference configs/default.yaml:49-52) -----------
    crop_img: bool = True
    crop_padding: float = 0.05
    mask_ratio_thresh: float = 0.82

    # ---- unproject / NBF (reference configs/default.yaml:54-58) ----------
    # 'vertex' (default): unified UV atlas via NBF unprojection.
    # 'face': legacy multi-material export — every face textured directly
    # from ONE view image (reference recon_one_shape unproject_by='face',
    # ours_utils.py:1218-1249; pipeline/face_assign.py).  Skips
    # unwrap/complete/optimize.
    unproject_by: str = "vertex"
    # unproject_by='face' only: skip the pixel-count/propagation machinery
    # and take argmax(normal . view_dir) per face (reference naive_face_view)
    naive_face_view: bool = False
    edge_dilate_kernels: List[int] = field(default_factory=lambda: [21])
    # The reference's `edge_dilate_kernels*(res//256)` (unproject.py:289)
    # is python list REPETITION — the effective border width stays 21 at
    # every atlas resolution.  Parity keeps that default; set True to
    # scale the width with resolution instead (wider borders at 1024^2).
    scale_nbf_kernels_with_res: bool = False
    optimize_from: Optional[str] = "ours"   # None|'scratch'|'naive'|'ours'
    xatlas_texture_res: int = 1024
    complete_unseen_by: str = "neighbor"    # 'unproject'|'optimize'|'neighbor'

    # ---- atlas optimization (reference ours_utils.py:1583-1785) ----------
    optimize_iters: int = 100
    optimize_lr: float = 5e-2
    optimize_render_res: int = 256  # reference renders at 1024
                                    # (ours_utils.py:1607) but compares to
                                    # bilinearly UPSAMPLED 256-res inpainted
                                    # targets — rendering at the native
                                    # target res adds no information and is
                                    # 16x cheaper

    # ---- misc ------------------------------------------------------------
    seed: int = 42  # reference demo.py:34 kiui.seed_everything(42)
    sample_num: int = 100000

    # keys from the reference configs that exist for parity but are unused
    # in the demo path; kept so reference YAMLs load cleanly.
    exist_root_path: Optional[str] = None
    cls_id: Optional[str] = None
    input_pc_generate_method: Optional[str] = None
    demo: bool = False
    geo_root: Optional[str] = None
    load_exist_dense_img_path: Optional[str] = None
    use_GT_geo_watertight: bool = False
    use_GT_multi_view_img: bool = False
    input_type: str = "object"
    project2mesh: bool = False


_FIELDS = {f.name: f for f in dataclasses.fields(PipelineConfig)}


def _coerce(name: str, value):
    """YAML 'None' strings -> None; ints for int fields; lists kept."""
    if isinstance(value, str) and value == "None":
        return None
    f = _FIELDS[name]
    if f.type in ("int", int) and isinstance(value, float):
        return int(value)
    return value


def load_config(path_or_dict, strict: bool = False) -> PipelineConfig:
    """Load a PipelineConfig from a YAML file path or a dict.

    Reference-compatible: all keys of /root/reference/configs/*.yaml are
    accepted.  Unknown keys raise in strict mode, else are collected in
    the returned config's `extra` attribute and warned about.
    """
    if isinstance(path_or_dict, dict):
        raw = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            raw = yaml.safe_load(f.read()) or {}

    known, unknown = {}, {}
    for k, v in raw.items():
        if k in _FIELDS:
            known[k] = _coerce(k, v)
        else:
            unknown[k] = v
    if unknown:
        if strict:
            raise KeyError(f"unknown config keys: {sorted(unknown)}")
        import warnings

        warnings.warn(f"ignoring unknown config keys: {sorted(unknown)}")
    cfg = PipelineConfig(**known)
    object.__setattr__(cfg, "extra", unknown)
    return cfg


def save_config(cfg: PipelineConfig, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
