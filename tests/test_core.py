"""Unit tests for core: config, IO round-trips, camera projection."""
import numpy as np
import jax.numpy as jnp

from pointdreamer_tpu.core.config import PipelineConfig, load_config
from pointdreamer_tpu.core import io as pio
from pointdreamer_tpu.core.camera import (
    CameraRig,
    fibonacci_sphere,
    make_camera_rig,
    ndc_to_pixels,
)


def test_config_defaults_and_reference_yaml(tmp_path):
    cfg = PipelineConfig()
    assert cfg.view_num == 8 and cfg.res == 256 and cfg.xatlas_texture_res == 1024
    # a reference-style YAML with 'None' strings and unknown keys loads
    y = tmp_path / "c.yaml"
    y.write_text(
        "texture_gen_method: 'nearest'\nnoise_stddev: None\n"
        "edge_dilate_kernels: [21, 11]\nsomething_unknown: 3\n"
    )
    cfg = load_config(str(y))
    assert cfg.texture_gen_method == "nearest"
    assert cfg.noise_stddev is None
    assert cfg.edge_dilate_kernels == [21, 11]
    assert cfg.extra == {"something_unknown": 3}


def test_shipped_default_is_reference_faithful_bf16():
    """configs/default.yaml must keep the bf16 DDNM path: the 552M
    on-device record (docs/w8a8_flagship_fidelity_r05.json) measured the
    int8 sampler 15 dB below the bf16-vs-fp32 precision floor, so w8a8
    stays opt-in (README 'Why w8a8 is opt-in')."""
    import os

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "default.yaml"))
    assert cfg.texture_gen_method == "DDNM_inpaint"
    assert cfg.ddnm_quant_int8 is False
    assert cfg.unproject_by == "vertex"


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((100, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "x.ply")
    pio.save_colored_pc_ply(xyz, rgb, p)
    xyz2, rgb2 = pio.read_ply_xyzrgb(p)
    np.testing.assert_allclose(xyz, xyz2, atol=1e-6)
    np.testing.assert_array_equal(rgb, rgb2)


def test_reference_demo_ply_loads():
    xyz, rgb = pio.read_ply_xyzrgb("/root/reference/dataset/demo_data/clock.ply")
    assert xyz.shape == (30000, 3) and rgb.shape == (30000, 3)
    assert np.isfinite(xyz).all()
    assert rgb.max() > 10  # has actual colors


def test_obj_roundtrip(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int64)
    uv = np.array([[0, 0], [1, 0], [0, 1], [0.5, 0.5], [1, 1], [0, 1]],
                  dtype=np.float32)
    fuv = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int64)
    p = str(tmp_path / "m.obj")
    pio.save_textured_obj(v, uv, f, fuv, p)
    m = pio.load_obj(p)
    np.testing.assert_allclose(m["vertices"], v, atol=1e-5)
    np.testing.assert_array_equal(m["faces"], f)
    np.testing.assert_allclose(m["uvs"], uv, atol=1e-5)
    np.testing.assert_array_equal(m["face_uv_idx"], fuv)
    assert (tmp_path / "m.mtl").exists()


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((16, 16, 3)).astype(np.float32)
    p = str(tmp_path / "i.png")
    pio.save_rgb(img, p)
    img2 = pio.load_rgb(p)
    assert np.abs(img - img2).max() < 1.0 / 255.0 + 1e-6


def test_fibonacci_matches_reference_formula():
    pts = fibonacci_sphere(8, 1.6)
    assert pts.shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.6, atol=1e-6)
    # first point is at the +y pole direction
    np.testing.assert_allclose(pts[0][1], 1.6, atol=1e-6)


def test_camera_projection_geometry():
    rig = make_camera_rig(num_views=8, distance=1.6, res=512)
    assert rig.num_views == 8
    # the origin projects to the image center of every view at depth=dist
    ndc, depth = rig.transform(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(ndc), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), 1.6, atol=1e-5)
    # a point halfway toward a camera projects to center, smaller depth
    eye0 = np.asarray(rig.eyes)[0]
    ndc, depth = rig.transform(jnp.asarray(eye0[None] * 0.5))
    np.testing.assert_allclose(np.asarray(ndc[0]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth[0]), 0.8, atol=1e-5)


def test_camera_row_is_top_down():
    # a point above the origin (world +y) must land in the upper half
    # (small row index) of a side-on camera's image
    rig = make_camera_rig(num_views=6, distance=1.6, res=512,
                          distribution="self_defined")
    # view 0 looks from -z toward origin, up = +y
    ndc, depth = rig.transform(jnp.asarray([[0.0, 0.3, 0.0]]))
    pix = np.asarray(ndc_to_pixels(ndc, 512))
    assert pix[0, 0, 0] < 256  # row < center -> top half
    # world +x should land right half of that camera (col > center):
    # looking from -z toward +z, +x appears on the LEFT of the screen
    ndc, _ = rig.transform(jnp.asarray([[0.3, 0.0, 0.0]]))
    pix = np.asarray(ndc_to_pixels(ndc, 512))
    assert pix[0, 0, 1] < 256


def test_rig_is_pytree():
    import jax

    rig = make_camera_rig(num_views=4)
    leaves = jax.tree_util.tree_leaves(rig)
    assert len(leaves) >= 4

    @jax.jit
    def f(r: CameraRig, pts):
        return r.transform(pts)[1].sum()

    out = f(rig, jnp.ones((10, 3)))
    assert np.isfinite(float(out))
