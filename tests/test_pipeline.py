"""Integration tests: unwrap, geometry, and the full end-to-end pipeline
(texture_gen_method='nearest', CPU-runnable — the reference's
configs/nearest.yaml path needs no checkpoints either)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from pointdreamer_tpu.core import io as pio
from pointdreamer_tpu.core.config import PipelineConfig
from pointdreamer_tpu.pipeline import geometry as pgeo
from pointdreamer_tpu.pipeline import unwrap as punwrap
from pointdreamer_tpu.pipeline.pipeline import Pipeline


def _cube_mesh():
    # 8 verts, 12 faces
    v = np.array([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                  for z in (-.5, .5)], np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2],   # x=-0.5
        [4, 6, 7], [4, 7, 5],   # x=+0.5
        [0, 4, 5], [0, 5, 1],   # y=-0.5
        [2, 3, 7], [2, 7, 6],   # y=+0.5
        [0, 2, 6], [0, 6, 4],   # z=-0.5
        [1, 5, 7], [1, 7, 3],   # z=+0.5
    ], np.int64)
    return v, f


def test_unwrap_cube():
    v, f = _cube_mesh()
    uvs, fuv = punwrap.unwrap(v, f, atlas_res=256)
    assert uvs.min() >= 0 and uvs.max() <= 1
    assert fuv.shape == f.shape
    atlas = punwrap.bake_atlas(jnp.asarray(v), jnp.asarray(f), uvs, fuv, 128)
    mask = np.asarray(atlas["mask"])
    assert mask.mean() > 0.15          # decent packing coverage
    # covered texels carry true on-surface world positions
    gb = np.asarray(atlas["gb_pos"])[mask]
    assert (np.abs(gb).max(axis=1) > 0.49).all()
    assert (np.abs(gb) <= 0.501).all()
    fid = np.asarray(atlas["per_atlas_pixel_face_id"])
    assert fid[mask].min() >= 0 and fid[mask].max() < len(f)
    # uv triangles of different charts don't overlap: every covered texel's
    # interpolated position must be consistent with its face's plane
    fv = v[f[fid[mask]]]
    dists = np.abs(gb[:, None, :] - fv).min(1).max(-1)
    assert np.percentile(dists, 99) < 0.55


def test_unwrap_many_tiny_charts():
    """Sliver-chart swarm regime (topological-noise meshes): a small
    gyroid fragments into dozens of charts, most tiny enough to take the
    integral-image rect-placement fast path in _pack_bitmap.  Asserts
    the layout is still overlap-free and covers every face."""
    from pointdreamer_tpu.ops import iso

    res = 20
    t = np.linspace(-0.55, 0.55, res).astype(np.float32)
    X, Y, Z = np.meshgrid(t, t, t, indexing="ij")
    s = 10.0
    vals = (np.sin(s * X) * np.cos(s * Y) + np.sin(s * Y) * np.cos(s * Z)
            + np.sin(s * Z) * np.cos(s * X)).astype(np.float32)
    v, f = iso.marching_tets(vals, t)
    v, f = np.asarray(v), np.asarray(f)
    assert len(f) > 3000
    uvs, fuv = punwrap.unwrap(v, f, atlas_res=512)
    assert uvs.min() >= 0 and uvs.max() <= 1
    assert fuv.shape == f.shape
    atlas = punwrap.bake_atlas(jnp.asarray(v), jnp.asarray(f), uvs, fuv, 512)
    mask = np.asarray(atlas["mask"])
    fid = np.asarray(atlas["per_atlas_pixel_face_id"])
    # overlap-free: every covered texel's face plane contains its world pos
    gb = np.asarray(atlas["gb_pos"])[mask]
    fv = v[f[fid[mask]]]
    dists = np.abs(gb[:, None, :] - fv).min(1).max(-1)
    assert np.percentile(dists, 99) < 0.2
    # most faces got atlas area (sub-texel faces and rect-slot slivers
    # may miss texel centers at 512²)
    assert len(np.unique(fid[mask])) > 0.7 * len(f)


def _hull_sphere(n=2000, seed=0):
    from scipy.spatial import ConvexHull

    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    v = (d * 0.5).astype(np.float32)
    f = ConvexHull(d).simplices.astype(np.int64)
    fv = v[f]
    nrm = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    flip = (nrm * fv.mean(1)).sum(1) < 0
    f[flip] = f[flip][:, [0, 2, 1]]
    return v, f


def test_unwrap_coverage_sphere():
    """LSCM + bitmap packing reaches decent atlas coverage on a curved
    mesh (the round-1 shelf-packed box projection managed ~37% on real
    meshes; the clock demo mesh now reaches ~74%)."""
    v, f = _hull_sphere(1500)
    uvs, fuv = punwrap.unwrap(v, f, atlas_res=512)
    atlas = punwrap.bake_atlas(jnp.asarray(v), jnp.asarray(f), uvs, fuv, 512)
    cov = float(np.asarray(atlas["mask"]).mean())
    assert cov > 0.45, f"atlas coverage {cov}"
    # no UV fold-overs: every covered texel's face plane must contain its
    # interpolated world position
    mask = np.asarray(atlas["mask"])
    gb = np.asarray(atlas["gb_pos"])[mask]
    r = np.linalg.norm(gb, axis=1)
    assert (np.abs(r - 0.5) < 0.05).mean() > 0.99


def test_lscm_conformality():
    """LSCM flattening of a curved disk chart approximately preserves
    triangle angles (conformal), unlike orthographic box projection."""
    # spherical cap: z = sqrt(1-x^2-y^2) over a disk grid
    n = 12
    g = np.linspace(-0.55, 0.55, n)
    xx, yy = np.meshgrid(g, g)
    zz = np.sqrt(np.clip(1.0 - xx ** 2 - yy ** 2, 0.2, None))
    pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    faces = np.array(faces)
    uv = punwrap._lscm(pts, faces)
    assert uv is not None

    def angles(p, tri):
        out = []
        for k in range(3):
            e1 = p[tri[:, (k + 1) % 3]] - p[tri[:, k]]
            e2 = p[tri[:, (k + 2) % 3]] - p[tri[:, k]]
            c = (e1 * e2).sum(-1) / (
                np.linalg.norm(e1, axis=-1) * np.linalg.norm(e2, axis=-1))
            out.append(np.arccos(np.clip(c, -1, 1)))
        return np.stack(out, -1)

    a3 = angles(pts, faces)
    a2 = angles(np.concatenate([uv, np.zeros((len(uv), 1))], -1), faces)
    err = np.abs(a3 - a2).max()
    assert err < 0.15, f"max angle distortion {err} rad"


def test_vertex_refinement_improves_chamfer():
    """The 10-iteration occupancy bisection (reference
    generate.py:177-273) must move iso-vertices measurably closer to the
    true surface than plain linear interpolation on a coarse grid."""
    import jax.numpy as jnpp

    from pointdreamer_tpu.ops import iso as oiso, sdf as osdf

    # strongly nonlinear analytic field whose zero set is the r=0.5
    # sphere: linear interpolation along coarse grid edges has real bias,
    # bisection against the true field does not
    def field_fn(q):
        r = jnpp.linalg.norm(q, axis=-1)
        return r ** 3 - 0.5 ** 3

    res = 24  # coarse grid -> visible linear-interp error
    field = osdf.eval_sdf_on_grid(field_fn, res, pgeo.GRID_LO, pgeo.GRID_HI)
    axis = np.linspace(pgeo.GRID_LO, pgeo.GRID_HI, res, dtype=np.float32)
    verts, faces, keys = oiso.marching_tets(field, axis,
                                            return_edge_keys=True)
    assert len(verts) > 50
    refined = oiso.refine_vertices_bisection(field_fn, verts, keys, field,
                                             axis, iterations=10)
    err0 = np.abs(np.linalg.norm(verts, axis=1) - 0.5).mean()
    err1 = np.abs(np.linalg.norm(refined, axis=1) - 0.5).mean()
    assert err1 < err0 * 0.8, (err0, err1)
    # refined vertices stay on their grid edges (convex combination)
    assert np.abs(refined - verts).max() < (axis[1] - axis[0])


@pytest.mark.slow
def test_geometry_sphere_cloud():
    rng = np.random.default_rng(0)
    d = rng.standard_normal((4000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * 0.5).astype(np.float32)
    verts, faces = pgeo.reconstruct_mesh(pts, "hoppe", grid_res=48,
                                         target_faces=2000)
    assert 100 < len(faces) <= 2600
    r = np.linalg.norm(verts, axis=1)
    assert 0.4 < np.median(r) < 0.6


def test_geometry_poisson_sphere_cloud():
    rng = np.random.default_rng(1)
    d = rng.standard_normal((4000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * 0.5).astype(np.float32)
    verts, faces = pgeo.reconstruct_mesh(pts, "SPR", grid_res=48,
                                         target_faces=2000)
    assert 100 < len(faces) <= 2600
    r = np.linalg.norm(verts, axis=1)
    assert 0.35 < np.median(r) < 0.65


@pytest.mark.parametrize("method", ["nearest", "linear"])
def test_end_to_end_cube(tmp_path, demo_ply, method):
    cfg = PipelineConfig(
        output_path=str(tmp_path / "out"),
        texture_gen_method=method,
        geo_from="hoppe",
        grid_res=48,
        target_face_num=2000,
        cam_res=128,
        res=64,
        view_num=8,
        xatlas_texture_res=128,
        edge_dilate_kernels=[5],
        optimize_from="ours",
        optimize_iters=4,
        point_validation_by_o3d=True,
        complete_unseen_by="neighbor",
    )
    pipe = Pipeline.create(cfg)
    obj_path = pipe.recon_one_textured_mesh(demo_ply)
    assert os.path.exists(obj_path)
    out_root = os.path.dirname(os.path.dirname(obj_path))
    png = os.path.join(out_root, "models", "model_normalized.png")
    assert os.path.exists(png)

    # texture sanity: the cube's color equals position+0.5; verify that
    # sampling the exported texture at covered texels is correlated
    m = pio.load_obj(obj_path)
    atlas = pio.load_rgb(png)[::-1]          # undo the export flip
    uvs = m["uvs"]
    fuv = m["face_uv_idx"]
    f = m["faces"]
    v = m["vertices"]
    # face centroid color check over a sample of faces
    R = atlas.shape[0]
    cent_uv = uvs[fuv].mean(1)
    cent_pos = v[f].mean(1)
    pix = np.clip((cent_uv * R).astype(int), 0, R - 1)
    got = atlas[pix[:, 1], pix[:, 0]]
    want = np.clip(cent_pos + 0.5, 0, 1)
    err = np.abs(got - want).mean()
    assert err < 0.22, f"mean texture error {err}"


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["wo_NBF", "optimize_complete",
                                     "no_crop_unproject"])
def test_end_to_end_config_variants(tmp_path, demo_ply, variant):
    """Exercise the remaining reference config axes end-to-end:
    NBF off (configs/wo_NBF.yaml, edge_dilate_kernels=[0]), tri-plane
    unseen completion (complete_unseen_by='optimize'), and the
    crop_img=False + complete-by-projection path."""
    kw = dict(
        output_path=str(tmp_path / "out"), texture_gen_method="nearest",
        geo_from="hoppe", grid_res=40, target_face_num=1500, cam_res=64,
        res=64, view_num=4, xatlas_texture_res=64, optimize_from=None,
        point_validation_by_o3d=False, save_input_pc=False,
        edge_dilate_kernels=[3], complete_unseen_by="neighbor")
    if variant == "wo_NBF":
        kw["edge_dilate_kernels"] = [0]
    elif variant == "optimize_complete":
        kw["complete_unseen_by"] = "optimize"
    else:
        kw["crop_img"] = False
        kw["complete_unseen_by"] = "unproject"
    cfg = PipelineConfig(**kw)
    pipe = Pipeline.create(cfg)
    obj = pipe.recon_one_textured_mesh(demo_ply)
    assert os.path.exists(obj)
    atlas = pio.load_rgb(obj.replace(".obj", ".png"))
    assert np.isfinite(atlas).all()


@pytest.mark.slow
def test_multilevel_nbf(tmp_path, demo_ply):
    """Multi-level NBF kernel list (configs comment: [21,11,7,5,3,1])."""
    cfg = PipelineConfig(
        output_path=str(tmp_path / "out"), texture_gen_method="nearest",
        geo_from="hoppe", grid_res=40, target_face_num=1500, cam_res=64,
        res=64, view_num=4, xatlas_texture_res=64, optimize_from=None,
        point_validation_by_o3d=False, save_input_pc=False,
        edge_dilate_kernels=[7, 5, 3, 1], complete_unseen_by="neighbor")
    pipe = Pipeline.create(cfg)
    obj = pipe.recon_one_textured_mesh(demo_ply)
    assert os.path.exists(obj)


@pytest.mark.slow
def test_end_to_end_ddnm_tiny(tmp_path, demo_ply):
    """Full pipeline through the DDNM inpainting dispatch with a tiny
    randomly-initialized UNet (4 denoise steps) — exercises the entire
    diffusion texture path on CPU; colors are meaningless by design."""
    from pointdreamer_tpu.core.camera import make_camera_rig
    from pointdreamer_tpu.models.diffusion import load_inpainter

    cfg = PipelineConfig(
        output_path=str(tmp_path / "out"), texture_gen_method="DDNM_inpaint",
        geo_from="hoppe", grid_res=32, target_face_num=800, cam_res=64,
        res=32, view_num=4, xatlas_texture_res=64, optimize_from=None,
        point_validation_by_o3d=False, save_input_pc=False,
        edge_dilate_kernels=[3], complete_unseen_by="unproject")
    inpainter = load_inpainter(
        None, t_sampling=4,
        model_kwargs=dict(model_channels=32, out_channels=6,
                          num_res_blocks=1, channel_mult=(1, 2),
                          attention_ds=(2,), num_head_channels=16,
                          dtype=jnp.float32))
    rig = make_camera_rig(cfg.view_num, cfg.cam_distance, cfg.cam_res)
    pipe = Pipeline(cfg=cfg, rig=rig, inpainter=inpainter,
                    logger=__import__(
                        "pointdreamer_tpu.core.log",
                        fromlist=["get_logger"]).get_logger())
    obj = pipe.recon_one_textured_mesh(demo_ply)
    assert os.path.exists(obj)
    atlas = pio.load_rgb(obj.replace(".obj", ".png"))
    assert np.isfinite(atlas).all()


@pytest.mark.slow
def test_end_to_end_gt_views(tmp_path, demo_ply):
    """GT-texture ablation (reference recon_one_shape use_GT_multi_view_img
    / load_exist_dense_img_path, ours_utils.py:1046-1200): pre-rendered
    dense views replace the inpainting stage."""
    import shutil

    import jax.numpy as jnp

    from pointdreamer_tpu.eval.render import render_textured_views

    base = dict(
        texture_gen_method="nearest",
        geo_from="hoppe",
        grid_res=48, target_face_num=2000, cam_res=128, res=64,
        view_num=8, xatlas_texture_res=128, edge_dilate_kernels=[5],
        optimize_from="None", point_validation_by_o3d=False,
        complete_unseen_by="unproject", crop_img=False,
    )
    cfg1 = PipelineConfig(output_path=str(tmp_path / "ref_run"), **base)
    pipe1 = Pipeline.create(cfg1)
    obj1 = pipe1.recon_one_textured_mesh(demo_ply)

    # render 8 dense "GT" views of the run-1 textured mesh in the SAME
    # uncropped view frame the pipeline uses
    m = pio.load_obj(obj1)
    atlas = pio.load_rgb(os.path.join(os.path.dirname(obj1),
                                      "model_normalized.png"))[::-1]
    views = render_textured_views(
        pipe1.rig, jnp.asarray(m["vertices"]),
        jnp.asarray(m["faces"]), jnp.asarray(m["uvs"]),
        jnp.asarray(m["face_uv_idx"]), jnp.asarray(atlas), res=64)
    gt_dir = tmp_path / "gt_views"
    gt_dir.mkdir()
    for i in range(8):
        pio.save_rgb(np.asarray(views[i]), str(gt_dir / f"{i}.png"))

    # run 2: same geometry (copy the stage cache), GT views as the
    # dense-image source
    cfg2 = PipelineConfig(output_path=str(tmp_path / "gt_run"),
                          gt_views_path=str(gt_dir), **base)
    name = os.path.splitext(os.path.basename(demo_ply))[0]
    (tmp_path / "gt_run" / name / "geo").mkdir(parents=True)
    shutil.copy(tmp_path / "ref_run" / name / "geo" / "untextured.obj",
                tmp_path / "gt_run" / name / "geo" / "untextured.obj")
    pipe2 = Pipeline.create(cfg2)
    obj2 = pipe2.recon_one_textured_mesh(demo_ply)

    # the GT-driven atlas must reproduce run 1's colors at shared texels
    a1 = pio.load_rgb(os.path.join(os.path.dirname(obj1),
                                   "model_normalized.png"))
    a2 = pio.load_rgb(os.path.join(os.path.dirname(obj2),
                                   "model_normalized.png"))
    both = (a1.sum(-1) > 0.05) & (a2.sum(-1) > 0.05)
    assert both.mean() > 0.2
    err = np.abs(a1[both] - a2[both]).mean()
    assert err < 0.1, f"GT-view atlas diverges: mean err {err}"


def test_end_to_end_face_mode(tmp_path, demo_ply):
    """unproject_by='face' (legacy multi-material path,
    ours_utils.py:1218-1249): every face is assigned to one view and
    textured from that view's image directly — verify the written
    multi-material OBJ resolves to approximately the cube's
    position-coded colors."""
    cfg = PipelineConfig(
        output_path=str(tmp_path / "out"), texture_gen_method="nearest",
        geo_from="hoppe", grid_res=48, target_face_num=2000, cam_res=128,
        res=64, view_num=8, unproject_by="face",
        point_validation_by_o3d=True, save_input_pc=False)
    pipe = Pipeline.create(cfg)
    obj = pipe.recon_one_textured_mesh(demo_ply)
    assert os.path.exists(obj)
    mdir = os.path.dirname(obj)
    # one texture png per view
    for i in range(8):
        assert os.path.exists(os.path.join(mdir, f"{i}.png"))

    # parse the multi-material OBJ
    verts, vts, tris, tri_uv, tri_mat = [], [], [], [], []
    mat = -1
    for line in open(obj):
        t = line.split()
        if not t:
            continue
        if t[0] == "v":
            verts.append([float(x) for x in t[1:4]])
        elif t[0] == "vt":
            vts.append([float(x) for x in t[1:3]])
        elif t[0] == "usemtl":
            mat = int(t[1].split("_")[1])
        elif t[0] == "f":
            a = [p.split("/") for p in t[1:4]]
            tris.append([int(p[0]) - 1 for p in a])
            tri_uv.append([int(p[1]) - 1 for p in a])
            tri_mat.append(mat)
    verts = np.array(verts)
    vts = np.array(vts)
    tris = np.array(tris)
    tri_uv = np.array(tri_uv)
    tri_mat = np.array(tri_mat)
    assert (tri_mat >= 0).all() and len(tris) > 500
    assert len(np.unique(tri_mat)) >= 2      # multiple materials used

    imgs = [pio.load_rgb(os.path.join(mdir, f"{i}.png"))[::-1]
            for i in range(8)]               # undo the v-flip
    res = imgs[0].shape[0]
    cent_uv = vts[tri_uv].mean(1)            # [F,2] (u, 1-v_img)
    cent_pos = verts[tris].mean(1)
    pix_c = np.clip((cent_uv[:, 0] * res).astype(int), 0, res - 1)
    pix_r = np.clip(((1.0 - cent_uv[:, 1]) * res).astype(int), 0, res - 1)
    got = np.stack([imgs[m][r, c]
                    for m, r, c in zip(tri_mat, pix_r, pix_c)])
    want = np.clip(cent_pos + 0.5, 0, 1)
    err = np.abs(got - want).mean()
    assert err < 0.25, f"mean face-texture error {err}"
