"""ctypes binding for the C++ quadric-decimation library (native/qem).

Builds libqem.so with g++ on first use (the environment ships g++ but not
pybind11; ctypes keeps the binding dependency-free).  Reference
counterpart: o3d simplify_quadric_decimation at generate.py:283 and the
vendored libsimplify.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _repo_root():
    return os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))


def build(force: bool = False) -> str:
    src = os.path.join(_repo_root(), "native", "qem", "qem.cpp")
    out = os.path.join(_repo_root(), "native", "qem", "libqem.so")
    if force or not os.path.exists(out) or (
            os.path.getmtime(out) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", out])
    return out


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build())
        lib.qem_simplify.restype = ctypes.c_int
        lib.qem_simplify.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    return _LIB


def simplify(vertices: np.ndarray, faces: np.ndarray,
             target_faces: int) -> Tuple[np.ndarray, np.ndarray]:
    """QEM edge-collapse to ~target_faces. Returns (verts, faces)."""
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    if len(f) <= target_faces:
        return v, f
    lib = _load()
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    nv = ctypes.c_int(0)
    nf = ctypes.c_int(0)
    rc = lib.qem_simplify(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(f),
        int(target_faces),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(nv),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(nf))
    if rc != 0:
        raise RuntimeError(f"qem_simplify failed rc={rc}")
    return out_v[: nv.value].copy(), out_f[: nf.value].copy()
