"""Tests: GLB export, debug vis, pc sampling, batch driver, alt models."""
import os

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from pointdreamer_tpu.core.mesh import Mesh
from pointdreamer_tpu.core import io as pio
from pointdreamer_tpu.core import vis as pvis
from pointdreamer_tpu.data import sample_colored_pc_from_mesh
from pointdreamer_tpu.models.occupancy import alt as palt
from pointdreamer_tpu.models.occupancy.spatial import compute_spatial


def _cube():
    v = np.array([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                  for z in (-.5, .5)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
    return v, f


def test_glb_export(tmp_path):
    v, f = _cube()
    uvs = np.random.default_rng(0).random((8, 2)).astype(np.float32)
    tex = np.full((8, 8, 3), 0.5, np.float32)
    m = Mesh(vertices=v, faces=f, uvs=uvs, face_uv_idx=f.copy(),
             texture=tex)
    p = str(tmp_path / "m.glb")
    m.write(p)
    data = open(p, "rb").read()
    assert data[:4] == b"glTF"
    import struct

    magic, version, total = struct.unpack("<III", data[:12])
    assert version == 2 and total == len(data)
    # JSON chunk parses and references the texture
    jlen, jtype = struct.unpack("<II", data[12:20])
    import json

    gltf = json.loads(data[20:20 + jlen])
    assert gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"] >= 0
    assert "images" in gltf


def test_vis_helpers(tmp_path):
    a = np.zeros((8, 10, 3))
    b = np.ones((6, 4))
    cat = pvis.cat_images(a, b)
    assert cat.shape[0] == 8 and cat.shape[2] == 3
    pvis.save_image_sheet([a, b], str(tmp_path / "sheet.png"),
                          titles=["a", "b"])
    assert os.path.exists(tmp_path / "sheet.png")
    pvis.save_pointcloud_views(np.random.rand(50, 3), np.random.rand(50, 3),
                               str(tmp_path / "pc.png"))
    assert os.path.exists(tmp_path / "pc.png")


def test_sample_colored_pc():
    v, f = _cube()
    uvs = np.array([[0.1, 0.1]] * 8, np.float32)
    tex = np.zeros((16, 16, 3), np.float32)
    tex[:, :, 0] = 1.0  # red texture
    out = sample_colored_pc_from_mesh(v, f, uvs, f.copy(), tex,
                                      n_points=500, seed=0)
    assert out["coords"].shape == (500, 3)
    # samples lie on the cube surface
    assert (np.abs(out["coords"]).max(1) > 0.499).all()
    np.testing.assert_allclose(out["colors"][:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out["colors"][:, 1], 0.0, atol=1e-5)
    # normals unit
    np.testing.assert_allclose(
        np.linalg.norm(out["normals"], axis=1), 1.0, atol=1e-5)


def test_alt_backbone_and_decoders(rng):
    pos = jnp.asarray(rng.standard_normal((200, 3)).astype(np.float32))
    sp = compute_spatial(pos, decoder_queries=jnp.zeros((10, 3)),
                         decoder_k=8)
    pn = jax.tree_util.tree_map(jnp.asarray, palt.init_pointnet_params(0))
    lat = palt.pointnet_forward(pn, jnp.ones_like(pos), sp)
    assert lat.shape == (200, 32)
    assert np.isfinite(np.asarray(lat)).all()
    # every registered decoder runs through the shared dispatch contract
    for name, fn in palt.DECODERS.items():
        if name == "InterpAttentionKHeadsNet":
            continue          # main path, own params/tests (fkaconv)
        dp = jax.tree_util.tree_map(
            jnp.asarray, palt.init_alt_decoder_params(name, 0))
        out = fn(dp, lat, pos, jnp.zeros((10, 3)), sp["proj_indices"])
        assert out.shape == (10, 2), name
        assert np.isfinite(np.asarray(out)).all(), name


@pytest.mark.slow
def test_batch_driver(tmp_path, demo_ply):
    from pointdreamer_tpu.core.config import PipelineConfig
    from pointdreamer_tpu.pipeline.batch import run_dataset

    cfg = PipelineConfig(
        output_path=str(tmp_path / "out"), texture_gen_method="nearest",
        geo_from="hoppe", grid_res=32, target_face_num=800, cam_res=64,
        res=32, view_num=4, xatlas_texture_res=64,
        edge_dilate_kernels=[3], optimize_from=None,
        point_validation_by_o3d=False, complete_unseen_by="unproject",
        save_input_pc=False)
    res = run_dataset(cfg, [demo_ply])
    (name, rec), = res.items()
    assert rec["status"] == "ok" and os.path.exists(rec["obj"])
    # idempotent resume
    res2 = run_dataset(cfg, [demo_ply])
    assert list(res2.values())[0]["status"] == "cached"
    # throughput mode: two shapes in flight on one device + jit cache
    import shutil
    ply_b = str(tmp_path / "copyb.ply")
    shutil.copy(demo_ply, ply_b)
    res3 = run_dataset(cfg, [demo_ply, ply_b], concurrency=2)
    assert len(res3) == 2
    assert res3[name]["status"] == "cached"
    assert res3["copyb"]["status"] == "ok"
    assert os.path.exists(res3["copyb"]["obj"])


def test_multi_material_obj_export(tmp_path):
    from pointdreamer_tpu.pipeline.export import save_multi_material_obj

    v, f = _cube()
    fv_ids = np.arange(len(f)) % 3
    uvs = np.random.default_rng(0).random((len(f), 3, 2)).astype(np.float32)
    imgs = np.random.default_rng(1).random((3, 16, 16, 3)).astype(np.float32)
    obj = save_multi_material_obj(v, f, fv_ids, uvs, imgs, str(tmp_path))
    txt = open(obj).read()
    assert txt.count("usemtl") == 3
    assert txt.count("\nf ") == len(f)
    assert os.path.exists(tmp_path / "model_normalized.mtl")
    assert os.path.exists(tmp_path / "2.png")
    m = pio.load_obj(obj)
    # faces are regrouped by material: compare as sets
    got = {tuple(r) for r in m["faces"]}
    assert got == {tuple(r) for r in f}


def test_ckpt_util_download_and_verify(tmp_path, monkeypatch):
    """ckpt_util's fetch+verify+cache path end-to-end over file:// (no
    egress here; urllib serves local files through the same code path).
    Reference: models/DDNM/functions/ckpt_util.py:37-72."""
    import hashlib

    from pointdreamer_tpu.models.diffusion import ckpt_util

    blob = b"pretend-torch-checkpoint" * 1000
    src = tmp_path / "weights.pt"
    src.write_bytes(blob)
    url = "file://" + str(src)
    md5 = hashlib.md5(blob).hexdigest()
    monkeypatch.setitem(ckpt_util.CKPT_REGISTRY, "toy", (url, md5))

    root = str(tmp_path / "cache")
    p = ckpt_util.get_ckpt_path("toy", root=root)
    assert open(p, "rb").read() == blob
    assert not p.endswith(".part") and p.startswith(root)

    # corrupt the cached copy: check=True must refetch and heal it
    with open(p, "wb") as f:
        f.write(b"corrupt")
    p2 = ckpt_util.get_ckpt_path("toy", root=root, check=True)
    assert p2 == p and open(p, "rb").read() == blob

    # a wrong registry hash must raise, not hand back a bad file
    monkeypatch.setitem(ckpt_util.CKPT_REGISTRY, "bad", (url, "0" * 32))
    import pytest as _pytest
    with _pytest.raises(IOError):
        ckpt_util.get_ckpt_path("bad", root=str(tmp_path / "cache2"))

    with _pytest.raises(KeyError):
        ckpt_util.get_ckpt_path("nope")
