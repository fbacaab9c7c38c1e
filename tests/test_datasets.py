"""Dataset loaders against synthetic on-disk fixtures mirroring the
reference layouts (datasets/shapenet.py, abc.py, abc_test.py,
synthetic_room.py, scenenet.py)."""
import os

import numpy as np
import pytest

from pointdreamer_tpu.models.occupancy import datasets as D


@pytest.fixture
def p2s_root(tmp_path):
    root = tmp_path / "p2s"
    v = root / "abc"
    (v / "04_pts").mkdir(parents=True)
    (v / "05_query_pts").mkdir()
    (v / "05_query_dist").mkdir()
    rng = np.random.default_rng(0)
    names = ["shape_a", "shape_b", "shape_c"]
    for n in names:
        np.save(v / "04_pts" / f"{n}.xyz.npy",
                rng.standard_normal((500, 3)).astype(np.float32))
        np.save(v / "05_query_pts" / f"{n}.ply.npy",
                rng.standard_normal((300, 3)).astype(np.float32))
        np.save(v / "05_query_dist" / f"{n}.ply.npy",
                rng.standard_normal((300,)).astype(np.float32))
    (v / "trainset.txt").write_text("\n".join(names[:2]) + "\n")
    (v / "testset.txt").write_text(names[2] + "\n")
    return str(root)


def test_point2surf_train_split(p2s_root):
    ds = D.Point2SurfDataset(p2s_root, "abc", split="training",
                             n_points=128, n_queries=64)
    assert len(ds) == 2
    pts, q, occ = ds[0]
    assert pts.shape == (128, 3)
    assert q.shape == (64, 3)
    assert occ.shape == (64,) and set(np.unique(occ)) <= {0, 1}
    b = next(ds.batches(2, seed=1))
    assert b[0].shape == (2, 128, 3)


def test_point2surf_test_split_and_variants(p2s_root):
    # reference class-name alias resolves to the same directory
    ds = D.Point2SurfDataset(p2s_root, "ABC", split="test", n_points=64)
    assert len(ds) == 1
    pts, q, occ = ds[0]
    assert pts.shape == (64, 3)
    assert q.shape == (1, 3)          # no supervision on test sets
    assert ds.object_name(0) == "shape_c"
    assert D.POINT2SURF_VARIANTS["FamousTestSparse"] == "famous_sparse"


def test_synthetic_rooms(tmp_path):
    rng = np.random.default_rng(1)
    scene = tmp_path / "room0" / "scene00"
    (scene / "pointcloud").mkdir(parents=True)
    (scene / "points_iou").mkdir()
    np.savez(scene / "pointcloud" / "00.npz",
             points=rng.standard_normal((400, 3)).astype(np.float32))
    occ = rng.random(256) < 0.4
    np.savez(scene / "points_iou" / "00.npz",
             points=rng.standard_normal((256, 3)).astype(np.float32),
             occupancies=np.packbits(occ))
    ds = D.SyntheticRoomsOccupancy(str(tmp_path), n_points=100,
                                   n_queries=50)
    assert len(ds) == 1
    pts, q, o = ds[0]
    assert pts.shape == (100, 3) and q.shape == (50, 3)
    assert o.dtype == np.int32


def test_scenenet_points(tmp_path):
    rng = np.random.default_rng(2)
    d = tmp_path / "1Bathroom"
    d.mkdir()
    arr = np.concatenate([rng.standard_normal((200, 3)),
                          rng.standard_normal((200, 3))], 1)
    np.savetxt(d / "x_labels.obj.ply.xyz", arr)
    ds = D.SceneNetPoints(str(tmp_path), n_points=64)
    assert len(ds) == 1
    pos, nls, _ = ds[0]
    assert pos.shape == (64, 3) and nls.shape == (64, 3)


def test_load_ply_mesh_ascii_and_binary(tmp_path):
    from pointdreamer_tpu.core.io import load_ply_mesh

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    # ascii (with one quad to exercise fan triangulation)
    p = tmp_path / "m.ply"
    with open(p, "w") as fh:
        fh.write("ply\nformat ascii 1.0\nelement vertex 4\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "element face 1\n"
                 "property list uchar int vertex_indices\nend_header\n")
        for row in v:
            fh.write(" ".join(map(str, row)) + "\n")
        fh.write("4 0 1 2 3\n")
    m = load_ply_mesh(str(p))
    np.testing.assert_allclose(m["vertices"], v)
    assert m["faces"].shape == (2, 3)          # quad -> 2 tris

    # binary
    pb = tmp_path / "mb.ply"
    with open(pb, "wb") as fh:
        fh.write(b"ply\nformat binary_little_endian 1.0\n"
                 b"element vertex 4\n"
                 b"property float x\nproperty float y\nproperty float z\n"
                 b"element face 2\n"
                 b"property list uchar int vertex_indices\nend_header\n")
        fh.write(v.astype("<f4").tobytes())
        for tri in f:
            fh.write(np.uint8(3).tobytes() + tri.astype("<i4").tobytes())
    m = load_ply_mesh(str(pb))
    np.testing.assert_allclose(m["vertices"], v)
    np.testing.assert_array_equal(m["faces"], f)


# ---------------------------------------------------------------------------
# DDNM image datasets (models/DDNM/datasets -> diffusion/datasets.py)
# ---------------------------------------------------------------------------

def _write_img(path, w, h, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


def test_ddnm_image_folder_center_crop(tmp_path):
    from pointdreamer_tpu.models.diffusion import datasets as DD

    root = tmp_path / "imgs"
    os.makedirs(root)
    _write_img(root / "a.png", 700, 520, 0)   # >= 2x -> BOX halving path
    _write_img(root / "b.jpg", 300, 260, 1)
    (root / "skip.dat").write_bytes(b"not an image")
    ds = DD.get_dataset("IMAGENET", str(root), image_size=256)
    assert len(ds) == 2
    for i in range(len(ds)):
        img = ds[i]
        assert img.shape == (256, 256, 3)
        assert img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0
    names, batch = next(ds.batches(8))
    assert batch.shape == (2, 256, 256, 3)
    assert len(names) == 2


def test_ddnm_celeba_crop_and_transforms(tmp_path):
    from pointdreamer_tpu.models.diffusion import datasets as DD

    root = tmp_path / "celeba"
    os.makedirs(root)
    _write_img(root / "f1.png", 178, 218, 3)  # celeba native size
    ds = DD.get_dataset("CELEBA", str(root), image_size=64)
    img = ds[0]
    assert img.shape == (64, 64, 3)
    x = DD.data_transform(img)
    assert x.min() >= -1.0 and x.max() <= 1.0
    back = DD.inverse_data_transform(x)
    np.testing.assert_allclose(back, img, atol=1e-6)


def test_ddnm_dataset_missing_root(tmp_path):
    from pointdreamer_tpu.models.diffusion import datasets as DD

    with pytest.raises(FileNotFoundError):
        DD.get_dataset("LSUN", str(tmp_path / "nope"))


# ---------------------------------------------------------------------------
# training transforms (lightconvpoint/utils/transforms.py equivalents)
# ---------------------------------------------------------------------------

def test_training_transforms():
    from pointdreamer_tpu.models.occupancy import transforms as T

    rng = np.random.default_rng(0)
    pts = rng.random((500, 3)).astype(np.float32) - 0.5
    q = rng.random((200, 3)).astype(np.float32) - 0.5
    occ = (rng.random(200) > 0.5).astype(np.int32)

    p2, q2, o2 = T.FixedPoints(128)(pts, q, occ, rng)
    assert p2.shape == (128, 3) and q2 is q and o2 is occ

    p3, q3, _ = T.RandomRotate(180.0, 2)(pts, q, occ, rng)
    # rotation about z preserves z and radii
    np.testing.assert_allclose(p3[:, 2], pts[:, 2], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(p3[:, :2], axis=1),
                               np.linalg.norm(pts[:, :2], axis=1),
                               atol=1e-5)
    # queries rotate by the SAME matrix: relative geometry preserved
    d_before = np.linalg.norm(pts[:200] - q, axis=1)
    d_after = np.linalg.norm(p3[:200] - q3, axis=1)
    np.testing.assert_allclose(d_after, d_before, atol=1e-5)

    p4, _, _ = T.RandomNoiseNormal(0.01)(pts, q, occ, rng)
    assert 0 < np.abs(p4 - pts).mean() < 0.02

    p5, _, _ = T.Permutation()(pts, q, occ, rng)
    assert not np.array_equal(p5, pts)
    np.testing.assert_allclose(np.sort(p5, 0), np.sort(pts, 0), atol=0)

    full = T.default_train_transform(n_points=64)
    p6, q6, o6 = full(pts, q, occ, rng)
    assert p6.shape == (64, 3) and q6.shape == q.shape


def test_batches_with_transform(p2s_root):
    from pointdreamer_tpu.models.occupancy import transforms as T

    ds = D.Point2SurfDataset(p2s_root, "abc", split="training",
                             n_points=128, n_queries=64)
    it = ds.batches(2, transform=T.default_train_transform())
    pts, q, occ = next(it)
    assert pts.shape == (2, 128, 3)
    assert q.shape[0] == 2 and occ.shape[0] == 2
