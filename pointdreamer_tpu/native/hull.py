"""ctypes binding for the C++ HPR quickhull library (native/hull).

Reference counterpart: o3d hidden_point_removal (qhull) at
ours_utils.py:204-225.  The dedicated 3-D quickhull only tracks the hull
vertex set, which is all HPR needs, and runs the spherical flip in C++
too — ~3x faster than scipy/qhull on the 1-core tunnel hosts.  Any view
that the C++ side flags as degenerate is recomputed with scipy, so the
result never falls below the previous path's robustness.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _repo_root():
    return os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))


def build(force: bool = False) -> str:
    src = os.path.join(_repo_root(), "native", "hull", "hull.cpp")
    out = os.path.join(_repo_root(), "native", "hull", "libhull.so")
    if force or not os.path.exists(out) or (
            os.path.getmtime(out) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", out])
    return out


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build())
        lib.hpr_visibility.restype = ctypes.c_int
        lib.hpr_visibility.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    return _LIB


def hpr_visibility(points: np.ndarray, eyes: np.ndarray,
                   radius_param: float = 100.0) -> np.ndarray:
    """Katz spherical-flip + quickhull visibility. Returns ([V, N] bool,
    [V] view return codes — nonzero views need the scipy fallback)."""
    pts = np.ascontiguousarray(points, np.float64)
    ey = np.ascontiguousarray(eyes, np.float64)
    n, v = len(pts), len(ey)
    vis = np.zeros((v, n), np.uint8)
    rc = np.zeros(v, np.int32)
    lib = _load()
    lib.hpr_visibility(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        ey.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), v,
        float(radius_param),
        vis.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return vis.astype(bool), rc
