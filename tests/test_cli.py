"""CLI smoke tests: argument parsing + end-to-end on tiny artifacts."""
import json
import os
import sys

import numpy as np
import pytest

from pointdreamer_tpu.core import io as pio


def _tiny_textured_mesh(root, name):
    v = np.array([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                  for z in (-.5, .5)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
    from pointdreamer_tpu.pipeline.unwrap import unwrap

    uvs, fuv = unwrap(v, f, atlas_res=64)
    d = os.path.join(root, name, "models")
    os.makedirs(d, exist_ok=True)
    obj = os.path.join(d, "model_normalized.obj")
    pio.save_textured_obj(v, uvs, f, fuv, obj)
    pio.save_rgb(np.full((32, 32, 3), 0.5, np.float32),
                 obj.replace(".obj", ".png"))
    return obj


def _run(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [module.__name__] + argv)
    module.main()


def test_eval_meshes_cli(tmp_path, monkeypatch, capsys):
    from pointdreamer_tpu.cli import eval_meshes

    pred = str(tmp_path / "pred")
    gt = str(tmp_path / "gt")
    _tiny_textured_mesh(pred, "cube")
    _tiny_textured_mesh(gt, "cube")
    _run(eval_meshes, ["--pred_root", pred, "--gt_root", gt,
                       "--n_samples", "2000",
                       "--out", str(tmp_path / "r.txt")], monkeypatch)
    out = capsys.readouterr().out
    rec = json.loads(out.splitlines()[0])
    assert rec["chamfer_l1"] < 1e-3 and rec["iou"] > 0.9


def test_render_and_run_evaluation_cli(tmp_path, monkeypatch, capsys):
    from pointdreamer_tpu.cli import render_meshes, run_evaluation

    root = str(tmp_path / "meshes")
    _tiny_textured_mesh(root, "cube")
    renders = str(tmp_path / "renders")
    _run(render_meshes, ["--root", root, "--save_root", renders,
                         "--views", "4", "--res", "64",
                         "--distribution", "fibonacci_sphere"],
         monkeypatch)
    assert len(os.listdir(os.path.join(renders, "cube"))) == 4
    # evaluate renders against themselves -> perfect scores
    _run(run_evaluation, ["--gt_root", renders, "--pred_root", renders],
         monkeypatch)
    out = capsys.readouterr().out
    assert "psnr" in out


def test_generate_cli(tmp_path, monkeypatch, demo_ply, capsys):
    from pointdreamer_tpu.cli import generate

    out_obj = str(tmp_path / "m.obj")
    _run(generate, ["--pc_file", demo_ply, "--out", out_obj,
                    "--geo_from", "hoppe", "--grid_res", "32",
                    "--target_faces", "500"], monkeypatch)
    m = pio.load_obj(out_obj)
    assert len(m["faces"]) > 100


@pytest.mark.slow
def test_train_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from pointdreamer_tpu.models.occupancy import init_params
    from pointdreamer_tpu.models.occupancy import train as ptrain

    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(jnp.asarray, init_params(0))

    def it():
        while True:
            yield ptrain.synthetic_occupancy_batch(rng, 1, 128, 64)

    ck = str(tmp_path / "ck.pkl")
    p1, h1 = ptrain.fit(params, it(), epochs=1, steps_per_epoch=2,
                        checkpoint_path=ck)
    assert os.path.exists(ck)
    # resume continues from epoch 1 -> runs exactly one more epoch
    p2, h2 = ptrain.fit(params, it(), epochs=2, steps_per_epoch=2,
                        checkpoint_path=ck)
    assert [r["epoch"] for r in h2] == [1]
