"""Poisson surface reconstruction baseline.

Reference: baselines/spr.py (pymeshlab screened Poisson depth 12 +
quadric decimation, :26-74).  pymeshlab doesn't exist here; the TPU
equivalent is the FFT Poisson indicator (ops.sdf.poisson_indicator_grid)
+ marching tetrahedra + C++ QEM — same role, device-native.

baselines/NKSR.py (Neural Kernel Surface Reconstruction) is covered by
baselines/nksr.py: the same kernel-field model class with an analytic
biharmonic (phi(r)=r) RBF kernel standing in for the pretrained neural one (which needs
the external nksr package + weights, run in a separate conda env in the
reference).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def recon_one_shape_SPR(xyz: np.ndarray, rgb01: Optional[np.ndarray] = None,
                        simplify_face_num: int = 10000,
                        grid_res: int = 128
                        ) -> Tuple[np.ndarray, np.ndarray, None]:
    """Point cloud -> (vertices, faces, None) via Poisson reconstruction.
    Signature mirrors reference recon_one_shape_SPR (spr.py:26)."""
    from ..pipeline.geometry import reconstruct_mesh

    v, f = reconstruct_mesh(np.asarray(xyz, np.float32), "SPR",
                            grid_res=grid_res,
                            target_faces=simplify_face_num)
    return v, f, None


def recon_one_shape_NKSR(*args, **kwargs):
    """Kernel-field reconstruction (see baselines/nksr.py): the NKSR
    model class with an analytic biharmonic (phi(r)=r) RBF kernel in
    place of the pretrained neural one (which needs the external nksr package)."""
    from .nksr import recon_one_shape_NKSR as _impl

    return _impl(*args, **kwargs)


def main(pc_file: str, out_obj: str, simplify_face_num: int = 10000):
    """CLI parity with reference baselines/spr.py:77."""
    from ..core import io as pio
    from ..pipeline.geometry import normalize_points

    xyz, rgb = pio.read_ply_xyzrgb(pc_file)
    xyz_n, center, scale = normalize_points(xyz)
    v, f, _ = recon_one_shape_SPR(xyz_n, rgb)
    pio.save_obj(v * scale + center, f, out_obj)


if __name__ == "__main__":
    import sys

    main(sys.argv[1], sys.argv[2])
