"""End-to-end orchestration: colored point cloud -> textured mesh.

Reference: demo.py prepare/recon_one_textured_mesh/colorize_one_mesh
(demo.py:38-497).  Stage-level caching mirrors the reference (cached
untextured mesh OBJ demo.py:391-408, cached unwrap demo.py:429-448,
cached inpainted view PNGs demo.py:138-147).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core import io as pio
from ..core.camera import CameraRig, make_camera_rig
from ..core.config import PipelineConfig
from ..core.log import StageTimer, get_logger
from ..ops import raster as orast
from . import complete as pcomplete
from . import export as pexport
from . import geometry as pgeo
from . import inpaint as pinpaint
from . import optimize as popt
from . import project as pproject
from . import unwrap as punwrap
from . import unproject as punproject


def _bucket(n: int, step: int = 4096) -> int:
    return -(-n // step) * step


def _pad_mesh(verts: np.ndarray, faces: np.ndarray, step: int = 4096):
    """Pad to bucketed sizes so different shapes reuse compiled programs
    (the reference recompiles nothing — torch is eager — but on TPU every
    new (V, F) would retrace; degenerate padding faces never rasterize)."""
    nv, nf = len(verts), len(faces)
    pv, pf = _bucket(max(nv, 4), step), _bucket(max(nf, 4), step)
    verts_p = np.concatenate(
        [verts, np.repeat(verts[-1:], pv - nv, axis=0)]).astype(np.float32)
    faces_p = np.concatenate(
        [faces, np.zeros((pf - nf, 3), faces.dtype)])  # degenerate (0,0,0)
    return verts_p, faces_p, nv, nf


def _pad_points(xyz: np.ndarray, colors: np.ndarray, step: int = 4096):
    n = len(xyz)
    p = _bucket(n, step)
    xyz_p = np.concatenate(
        [xyz, np.repeat(xyz[-1:], p - n, axis=0)]).astype(np.float32)
    col_p = np.concatenate(
        [colors, np.repeat(colors[-1:], p - n, axis=0)])
    mask = np.zeros(p, bool)
    mask[:n] = True
    return xyz_p, col_p, mask


@dataclass
class Pipeline:
    """Holds the per-process state: config, cameras, models, logger."""

    cfg: PipelineConfig
    rig: CameraRig
    inpainter: object = None     # models.diffusion.DDNMInpainter or None
    poco_apply: object = None    # occupancy field fn or None
    logger: object = None

    @classmethod
    def create(cls, cfg: PipelineConfig, log_file: Optional[str] = None):
        from ..core.runtime import setup_jax

        setup_jax()
        logger = get_logger(log_file)
        rig = make_camera_rig(cfg.view_num, cfg.cam_distance, cfg.cam_res,
                              cfg.cam_fov_deg, cfg.camera_distribution)
        inpainter = None
        if cfg.texture_gen_method == "DDNM_inpaint":
            import os as _os

            if (cfg.diffusion_checkpoint
                    or _os.environ.get("PD_ALLOW_RANDOM_DIFFUSION") == "1"):
                import jax as _jax

                from ..models.diffusion import load_inpainter

                mesh = None
                n_dev = len(_jax.devices())
                if cfg.ddnm_data_parallel and n_dev > 1 \
                        and cfg.view_num % n_dev == 0:
                    from ..parallel.mesh import make_mesh

                    mesh = make_mesh(n_dev, tp=1)
                    logger.info(f"DDNM views sharded over {n_dev} devices")
                inpainter = load_inpainter(
                    cfg.diffusion_checkpoint, logger, mesh=mesh,
                    quant_int8=cfg.ddnm_quant_int8,
                    quant_static=cfg.ddnm_quant_static)
            else:
                # the reference auto-downloads 256x256_diffusion_uncond.pt
                # (diffusion.py:447-451); offline without a checkpoint a
                # random UNet only produces noise, so degrade explicitly
                logger.warning(
                    "texture_gen_method=DDNM_inpaint but no "
                    "diffusion_checkpoint configured: falling back to "
                    "'nearest' (set PD_ALLOW_RANDOM_DIFFUSION=1 to run "
                    "the sampler with random weights anyway)")
                cfg.texture_gen_method = "nearest"
        poco_apply = None
        if cfg.geo_from == "POCO" and cfg.poco_checkpoint:
            from ..models.occupancy import load_poco_field

            poco_apply = load_poco_field(cfg.poco_checkpoint, logger,
                                         decoder=cfg.network_decoder)
        return cls(cfg=cfg, rig=rig, inpainter=inpainter,
                   poco_apply=poco_apply, logger=logger)

    # ------------------------------------------------------------------
    def recon_one_textured_mesh(self, pc_file: str, name: Optional[str] = None,
                                timer: Optional[StageTimer] = None) -> str:
        """Wrapper adding optional device tracing: set PD_PROFILE_DIR to
        capture a jax.profiler trace of the whole reconstruction (the
        TPU upgrade of the reference's wall-clock stage logs,
        SURVEY §5 tracing)."""
        import contextlib

        prof_dir = os.environ.get("PD_PROFILE_DIR")
        with contextlib.ExitStack() as stack:
            if prof_dir:
                import jax

                stack.enter_context(jax.profiler.trace(prof_dir))
            return self._recon_impl(pc_file, name, timer)

    def _recon_impl(self, pc_file: str, name: Optional[str] = None,
                    timer: Optional[StageTimer] = None) -> str:
        cfg = self.cfg
        log = self.logger
        timer = timer or StageTimer(log)
        name = name or os.path.splitext(os.path.basename(pc_file))[0]
        out_root = os.path.join(cfg.output_path, name)
        geo_dir = os.path.join(out_root, "geo")
        others_dir = os.path.join(out_root, "others")
        os.makedirs(geo_dir, exist_ok=True)
        os.makedirs(others_dir, exist_ok=True)

        # ---- input ----------------------------------------------------
        xyz, rgb = pio.read_ply_xyzrgb(pc_file)
        if len(xyz) > cfg.max_points:
            raise ValueError(
                f"Point number > {cfg.max_points}! ({len(xyz)} points in "
                f"{pc_file}); subsample the input first")  # demo.py:372-374
        xyz_n, center, scale = pgeo.normalize_points(xyz)
        # HPR convex hulls depend only on (xyz_n, eyes): start them now on
        # a host thread so they overlap the device-bound geometry/unwrap
        # stages (~0.7 s serial on the single-core tunnel hosts)
        hpr_future = None
        if cfg.point_validation_by_o3d:
            from ..ops import splat as osplat

            hpr_future = pio._async_executor().submit(
                osplat.hidden_point_removal_visibility, xyz_n,
                np.asarray(self.rig.eyes), cfg.hidden_point_removal_radius)
        colors = jnp.asarray(rgb.astype(np.float32) / 255.0)
        if cfg.save_input_pc:
            pio.save_colored_pc_ply(xyz_n, np.asarray(colors),
                                    os.path.join(out_root, "input_pc.ply"))

        # ---- geometry (cached) ----------------------------------------
        with timer.stage("geometry") as tbox:
            cached_geo = pc_file.replace(".ply", "_untextured_mesh.obj")
            own_geo = os.path.join(geo_dir, "untextured.obj")
            external_mesh = os.path.exists(cached_geo)
            if external_mesh:
                m = pio.load_obj(cached_geo)
                verts = (m["vertices"] - center) / scale
                faces = m["faces"]
            elif os.path.exists(own_geo):
                m = pio.load_obj(own_geo)
                verts, faces = m["vertices"], m["faces"]
            else:
                verts, faces = pgeo.reconstruct_mesh(
                    xyz_n, cfg.geo_from, cfg.grid_res, cfg.target_face_num,
                    cfg.noise_stddev if not cfg.input_already_noisy else None,
                    self.poco_apply, smooth_mesh=cfg.smooth_mesh,
                    refine_iters=cfg.refine_vertex_iters,
                    iso_method=cfg.iso_method,
                    screen_weight=cfg.spr_screen_weight)
                # stage-cache artifact, read only by future runs: write it
                # on the io thread (flush_async_io at export guards reuse)
                pio._PENDING.append(pio._async_executor().submit(
                    pio.save_obj, verts, faces, own_geo))

        tbox["out"] = None
        # bucketed padding: device stages compile once per bucket, not per
        # shape (padding faces are degenerate and never rasterize)
        verts_p, faces_p, _, n_faces = _pad_mesh(verts, faces)
        xyz_p, colors_p, point_mask = _pad_points(
            xyz_n, rgb.astype(np.float32) / 255.0)
        colors = jnp.asarray(colors_p)
        verts_j = jnp.asarray(verts_p)
        faces_j = jnp.asarray(faces_p)
        f_normals = orast.face_normals(verts_j, faces_j)

        # ---- unwrap (host LSCM/packing) on a worker thread -------------
        # Unwrap needs only (verts, faces); nothing consumes it until the
        # unproject stage.  Running it on the io thread hides its ~0.7 s
        # of host work under the device-bound project/inpaint stages (the
        # DDNM scan alone holds the device for ~11 s while the host idles).
        R = cfg.xatlas_texture_res
        unwrap_cache = os.path.join(geo_dir, f"unwrap_{R}.npz")

        def _unwrap_host():
            if os.path.exists(unwrap_cache):
                z = np.load(unwrap_cache)
                return z["uvs"], z["face_uv_idx"]
            uv, fuv = punwrap.unwrap(verts, faces, atlas_res=R)
            np.savez(unwrap_cache, uvs=uv, face_uv_idx=fuv)
            return uv, fuv

        face_mode = cfg.unproject_by == "face"
        if not face_mode:   # the face path needs no UV atlas
            unwrap_future = pio._async_executor().submit(_unwrap_host)

        # ---- project + sparse images ----------------------------------
        with timer.stage("project") as tbox:
            proj = pproject.project_views(
                self.rig, verts_j, faces_j, jnp.asarray(xyz_p),
                crop=cfg.crop_img, padding=cfg.crop_padding,
                depth_offset=cfg.depth_offset,
                # external cached meshes may be open/inconsistently wound
                cull_backface=not external_mesh)
            proj = proj._replace(
                point_validation=proj.point_validation
                & jnp.asarray(point_mask)[None, :])
            if cfg.point_validation_by_o3d:
                proj = pproject.add_hpr_visibility(
                    proj, xyz_n, self.rig, cfg.hidden_point_removal_radius,
                    n_total=len(xyz_p), depth_guard=cfg.hpr_depth_guard,
                    precomputed=hpr_future.result())
            if cfg.refine_point_validation_by_remove_abnormal_depth:
                proj = pproject.refine_point_validation(
                    proj, cfg.refine_res)
            sparse = pproject.make_sparse_images(
                proj, colors, cfg.res, cfg.point_size, cfg.edge_point_size,
                cfg.mask_ratio_thresh)
            tbox["out"] = sparse.sparse_imgs
            pio.save_rgb_stack_async(
                sparse.sparse_imgs,
                [os.path.join(others_dir, f"{i}_sparse.png")
                 for i in range(self.rig.num_views)])

        # ---- inpaint (cached) -----------------------------------------
        scale_factors = sparse.scale_factors
        with timer.stage("inpaint") as tbox:
            cached = [os.path.join(others_dir, f"{i}_inpainted.png")
                      for i in range(self.rig.num_views)]
            if cfg.gt_views_path:
                # GT-texture ablation: pre-rendered dense views stand in
                # for the inpainted ones (reference recon_one_shape
                # use_GT_multi_view_img / load_exist_dense_img_path,
                # ours_utils.py:1141-1161)
                if cfg.crop_img and log:
                    log.warning("gt_views_path with crop_img=True: the "
                                "pre-rendered views must match the crop "
                                "frame exactly — use crop_img: false")
                imgs = []
                for i in range(self.rig.num_views):
                    p = os.path.join(cfg.gt_views_path, f"{i}_inpainted.png")
                    if not os.path.exists(p):
                        p = os.path.join(cfg.gt_views_path, f"{i}.png")
                    imgs.append(pio.load_rgb(p))
                inpainted = jnp.asarray(np.stack(imgs))
                if inpainted.shape[1] != cfg.res:
                    import jax as _jax

                    inpainted = _jax.image.resize(
                        inpainted, (len(imgs), cfg.res, cfg.res, 3),
                        method="linear")
                # dense renders carry no shrink-to-fit rescale
                scale_factors = jnp.ones_like(scale_factors)
            elif all(os.path.exists(p) for p in cached):
                inpainted = jnp.asarray(
                    np.stack([pio.load_rgb(p) for p in cached]))
            else:
                inpainted = pinpaint.get_inpainted_images(
                    sparse.sparse_imgs, sparse.hard_mask0, sparse.hard_mask2,
                    cfg.texture_gen_method, self.inpainter)
                pio.save_rgb_stack_async(inpainted, cached)
            tbox["out"] = inpainted

        # ---- face-mode unprojection (unproject_by='face') ---------------
        if face_mode:
            from . import face_assign as pface

            with timer.stage("unproject") as tbox:
                neighbors = pface.face_adjacency_neighbors(faces)
                counts = np.asarray(pface.face_view_pixel_counts(
                    proj.face_idxs, len(faces_p)))[:n_faces]
                sim = np.asarray(
                    f_normals[:n_faces] @ self.rig.base_dirs.T)
                if cfg.naive_face_view:
                    fv_ids = sim.argmax(axis=1).astype(np.int64)
                else:
                    fv_ids = pface.assign_face_views(neighbors, counts, sim)
                f_uvs = pface.face_corner_uvs(
                    self.rig, verts_p, faces, proj.uv_centers,
                    proj.uv_scales, proj.padding, scale_factors,
                    fv_ids)
                tbox["out"] = fv_ids
            with timer.stage("export"):
                obj_path = pexport.save_multi_material_obj(
                    verts, faces, fv_ids, f_uvs,
                    np.asarray(inpainted),
                    os.path.join(out_root, "models"))
                pio.flush_async_io()
            if log:
                log.info("stage timings:\n" + timer.report())
            return obj_path

        # ---- unwrap result + atlas bake (cached) ------------------------
        with timer.stage("unwrap") as tbox:
            uvs, face_uv_idx = unwrap_future.result()
            atlas = punwrap.bake_atlas(verts_j, faces_j, uvs, face_uv_idx, R)
            tbox["out"] = atlas["gb_pos"]

        # ---- unproject (NBF) ------------------------------------------
        with timer.stage("unproject") as tbox:
            up = punproject.unproject(
                inpainted, self.rig, f_normals,
                atlas["gb_pos"], atlas["mask"],
                atlas["per_atlas_pixel_face_id"],
                proj.mesh_depths, proj.uv_centers, proj.uv_scales,
                proj.padding, scale_factors,
                # The reference's `edge_dilate_kernels*(res//256)` at
                # unproject.py:289 is python list REPETITION: the border
                # width stays 21 at every resolution.  Default matches
                # that; scale_nbf_kernels_with_res opts into width scaling.
                kernel_sizes=tuple(
                    ((k * max(R // 256, 1)) | 1
                     if cfg.scale_nbf_kernels_with_res else k) if k else 0
                    for k in cfg.edge_dilate_kernels),
                view_res=cfg.res, depth_offset=cfg.depth_offset,
                complete_by_projection=(cfg.complete_unseen_by == "unproject"))
            tbox["out"] = up.atlas_img

        # ---- complete unseen ------------------------------------------
        with timer.stage("complete") as tbox:
            if cfg.complete_unseen_by == "neighbor":
                atlas_img = pcomplete.complete_by_neighbors(
                    verts, faces, uvs, face_uv_idx,
                    up.atlas_img, up.atlas_painted, atlas["mask"],
                    atlas["per_atlas_pixel_face_id"])
            elif cfg.complete_unseen_by == "optimize":
                from ..models.texture_field import fit_and_paint

                atlas_img = fit_and_paint(
                    up.atlas_img, up.atlas_painted, atlas["gb_pos"],
                    atlas["mask"], jnp.asarray(xyz_p),
                    colors)  # padded pair (dup points are harmless)
                atlas_img = pcomplete.dilate_atlas(atlas_img, up.atlas_painted)
            else:  # 'unproject'
                atlas_img = pcomplete.dilate_atlas(up.atlas_img,
                                                   up.atlas_painted)
            tbox["out"] = atlas_img

        # ---- optimize -------------------------------------------------
        if cfg.optimize_from and cfg.optimize_from != "None":
            with timer.stage("optimize") as tbox:
                init = None if cfg.optimize_from == "scratch" else atlas_img
                svis = (up.shrunk_visibility
                        if cfg.optimize_from == "ours" else None)
                atlas_img, _ = popt.optimize_color(
                    init, inpainted, self.rig, verts_j, faces_j,
                    jnp.asarray(uvs), jnp.asarray(face_uv_idx),
                    proj.uv_centers, proj.uv_scales, proj.padding,
                    scale_factors, svis,
                    render_res=cfg.optimize_render_res,
                    lr=cfg.optimize_lr, iterations=cfg.optimize_iters)
                tbox["out"] = atlas_img

        # ---- export ---------------------------------------------------
        with timer.stage("export"):
            obj_path = pexport.save_textured_mesh(
                verts, uvs, faces, face_uv_idx, atlas_img, atlas["mask"],
                out_root)
            pio.flush_async_io()    # intermediates must be on disk before
                                    # the stage caches are trusted
        if log:
            log.info("stage timings:\n" + timer.report())
        return obj_path
