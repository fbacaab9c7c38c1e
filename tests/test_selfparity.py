"""End-to-end texture fidelity acceptance (the >=30 dB north-star).

Full pipeline (SPR geometry -> LSCM unwrap -> project -> nearest inpaint
-> NBF unproject -> complete -> optimize -> export) on a synthetic cube
whose surface color is an analytic function of position, scored by
area-weighted sampling of the exported atlas (eval/selfparity.py).

Measured baselines (this harness):
  reduced settings (grid 64, cam 192, atlas 256, 10k pts):  31.1 dB CPU
  full settings    (grid 128, cam 512, atlas 1024, 30k pts): 30.2 dB TPU
The test asserts a margin below the reduced-settings number; the
full-settings run is PD_SELFPARITY_FULL=1 (minutes on TPU, hours on CPU).
"""
import json
import os

import pytest

from pointdreamer_tpu.eval.selfparity import run_roundtrip


# Reduced-res regression settings.  spr_screen_weight is pinned to 0
# here for the same reason iso_method is pinned below: at grid 64 the
# fixed-texel seam width magnifies any sub-cell surface shift on the
# sharp-edged cube (screening moves the iso surface toward the samples
# by a fraction of a cell).  The SHIPPED default (sw=2, 48 CG iters) is
# certified by the full-res gate (test_selfparity_cube_full, >=30 dB)
# and the geometry table (docs/geometry_table_r05.json).
QUICK = dict(grid_res=64, cam_res=192, res=128, xatlas_texture_res=256,
             target_face_num=4000, edge_dilate_kernels=[11], view_num=8,
             spr_screen_weight=0.0)


@pytest.mark.slow
def test_selfparity_cube_quick(tmp_path):
    # tets-pinned: at reduced atlas res the fixed-texel seam width
    # magnifies chart-boundary error on sharp-edged shapes; tets' denser
    # boundary vertices mask it.  (41.8/41.4 dB on the curved sphere and
    # 31.0/31.1 dB at full res for tets/mc — the gap is a reduced-res
    # cube artifact.)
    res = run_roundtrip(str(tmp_path), "cube", 10000,
                        overrides=dict(QUICK, iso_method="tets"))
    print("selfparity quick:", json.dumps(res))
    assert res["psnr_db"] >= 28.0, res
    assert res["mean_abs_err"] <= 0.02, res


@pytest.mark.slow
def test_selfparity_cube_quick_mc(tmp_path):
    # the default (marching cubes) path: measured 25.5 dB at these
    # reduced settings, 31.08 dB at full settings on TPU
    res = run_roundtrip(str(tmp_path), "cube", 10000,
                        overrides=dict(QUICK, iso_method="mc"))
    print("selfparity quick mc:", json.dumps(res))
    assert res["psnr_db"] >= 24.5, res


@pytest.mark.skipif(os.environ.get("PD_SELFPARITY_FULL") != "1",
                    reason="full-res run: minutes on TPU (set "
                           "PD_SELFPARITY_FULL=1)")
def test_selfparity_cube_full(tmp_path):
    res = run_roundtrip(str(tmp_path), "cube", 30000)
    print("selfparity full:", json.dumps(res))
    assert res["psnr_db"] >= 30.0, res


@pytest.mark.slow
def test_selfparity_sphere_quick(tmp_path):
    """Curved-surface variant: LSCM charts are genuinely non-developable
    here (unlike the cube's flat boxes).  Measured 41.8 dB."""
    res = run_roundtrip(str(tmp_path), "sphere", 10000, overrides=QUICK)
    print("selfparity sphere quick:", json.dumps(res))
    assert res["psnr_db"] >= 35.0, res
