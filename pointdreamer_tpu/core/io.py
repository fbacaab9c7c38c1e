"""Host-side IO: PLY point clouds, OBJ/MTL meshes, PNG images.

Self-contained replacements for the reference's plyfile/kaolin/PIL-based IO
(reference utils/other_utils.py:122-163 read/save PLY,
models/get3d/get3d_utils/utils_3d.py:27-64 savemeshtes2 OBJ writer,
utils/utils_2d.py:351-440 PNG helpers).  Pure numpy + PIL; no torch.
"""
from __future__ import annotations

import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image

# --------------------------------------------------------------------------
# PLY
# --------------------------------------------------------------------------

_PLY_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def read_ply_xyzrgb(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a PLY with x,y,z (+ red,green,blue) vertex properties.

    Supports ascii and binary_little_endian formats (the demo clouds are
    binary_little_endian; reference utils/other_utils.py:155 uses plyfile).
    Returns (xyz float32 [N,3], rgb uint8 [N,3]); rgb is zeros if absent.
    """
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n_vertex = 0
        props = []  # (name, numpy dtype str) for the vertex element
        cur_element = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            tok = line.decode("ascii", "replace").strip().split()
            if not tok:
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                cur_element = tok[1]
                if cur_element == "vertex":
                    n_vertex = int(tok[2])
            elif tok[0] == "property" and cur_element == "vertex":
                if tok[1] == "list":
                    raise ValueError("list property in vertex element")
                props.append((tok[-1], _PLY_TYPES[tok[1]]))
            elif tok[0] == "end_header":
                break

        if fmt == "ascii":
            rows = []
            for _ in range(n_vertex):
                rows.append(f.readline().split()[: len(props)])
            arr = np.array(rows, dtype=np.float64)
            data = {name: arr[:, i] for i, (name, _) in enumerate(props)}
        elif fmt == "binary_little_endian":
            dtype = np.dtype([(name, "<" + t) for name, t in props])
            buf = f.read(dtype.itemsize * n_vertex)
            rec = np.frombuffer(buf, dtype=dtype, count=n_vertex)
            data = {name: rec[name] for name, _ in props}
        else:
            raise ValueError(f"{path}: unsupported PLY format {fmt}")

    xyz = np.stack(
        [data["x"], data["y"], data["z"]], axis=1
    ).astype(np.float32)
    if "red" in data:
        rgb = np.stack(
            [data["red"], data["green"], data["blue"]], axis=1
        )
        if rgb.dtype != np.uint8:
            rgb = np.clip(rgb, 0, 255)
        rgb = rgb.astype(np.uint8)
    else:
        rgb = np.zeros((n_vertex, 3), dtype=np.uint8)
    return xyz, rgb


def load_ply_mesh(path: str) -> Dict[str, np.ndarray]:
    """Read a PLY MESH (vertex + face elements), ascii or
    binary_little_endian.  Returns {'vertices' [N,3] f32,
    'faces' [F,3] i64} (quads are fan-triangulated).  The point2surf GT
    meshes (eval/eval_point2surf/evaluation.py:221-305 load them with
    trimesh) are plain tri meshes in this format."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []           # (name, count, [(prop, dtype) | list])
        cur = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            tok = line.decode("ascii", "replace").strip().split()
            if not tok:
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                cur = (tok[1], int(tok[2]), [])
                elements.append(cur)
            elif tok[0] == "property" and cur is not None:
                if tok[1] == "list":
                    cur[2].append(("list", _PLY_TYPES[tok[2]],
                                   _PLY_TYPES[tok[3]], tok[-1]))
                else:
                    cur[2].append(("scalar", _PLY_TYPES[tok[1]], tok[-1]))
            elif tok[0] == "end_header":
                break

        verts, faces = None, []
        for name, count, props in elements:
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    idx = {p[-1]: i for i, p in enumerate(props)
                           if p[0] == "scalar"}
                    arr = np.array([[r[idx["x"]], r[idx["y"]], r[idx["z"]]]
                                    for r in rows], np.float32)
                    verts = arr
                elif name == "face":
                    for r in rows:
                        k = int(r[0])
                        poly = [int(v) for v in r[1:1 + k]]
                        for j in range(1, k - 1):
                            faces.append([poly[0], poly[j], poly[j + 1]])
            elif fmt == "binary_little_endian":
                if all(p[0] == "scalar" for p in props):
                    dtype = np.dtype([(p[-1], "<" + p[1]) for p in props])
                    rec = np.frombuffer(f.read(dtype.itemsize * count),
                                        dtype=dtype, count=count)
                    if name == "vertex":
                        verts = np.stack([rec["x"], rec["y"], rec["z"]],
                                         1).astype(np.float32)
                else:
                    # list property (face indices): parse sequentially
                    for _ in range(count):
                        for p in props:
                            if p[0] == "list":
                                cnt_dt = np.dtype("<" + p[1])
                                val_dt = np.dtype("<" + p[2])
                                k = int(np.frombuffer(
                                    f.read(cnt_dt.itemsize), cnt_dt)[0])
                                poly = np.frombuffer(
                                    f.read(val_dt.itemsize * k), val_dt,
                                    count=k).astype(np.int64)
                                if name == "face":
                                    for j in range(1, k - 1):
                                        faces.append([poly[0], poly[j],
                                                      poly[j + 1]])
                            else:
                                f.read(np.dtype("<" + p[1]).itemsize)
            else:
                raise ValueError(f"{path}: unsupported PLY format {fmt}")

    if verts is None:
        raise ValueError(f"{path}: no vertex element")
    return {"vertices": verts,
            "faces": np.asarray(faces, np.int64).reshape(-1, 3)}


def save_colored_pc_ply(xyz: np.ndarray, rgb01: np.ndarray, path: str) -> None:
    """Write xyz float + rgb (float in [0,1] or uint8) as binary PLY
    (reference utils/other_utils.py:122)."""
    xyz = np.asarray(xyz, dtype=np.float32)
    rgb = np.asarray(rgb01)
    if rgb.dtype != np.uint8:
        rgb = (np.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    n = len(xyz)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.empty(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("red", "u1"), ("green", "u1"), ("blue", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["red"], rec["green"], rec["blue"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


# --------------------------------------------------------------------------
# OBJ / MTL
# --------------------------------------------------------------------------

def save_textured_obj(
    vertices: np.ndarray,
    uvs: np.ndarray,
    faces: np.ndarray,
    face_uv_idx: np.ndarray,
    obj_path: str,
    texture_name: Optional[str] = None,
) -> None:
    """Write v/vt/f OBJ + companion MTL referencing a PNG texture.

    Output format matches the reference's savemeshtes2
    (models/get3d/get3d_utils/utils_3d.py:27-64): 1-based indices,
    `f v/vt` triplets, single material_0, map_Kd <name>.png.
    """
    fol = os.path.dirname(obj_path)
    os.makedirs(fol or ".", exist_ok=True)
    na = os.path.splitext(os.path.basename(obj_path))[0]
    if texture_name is None:
        texture_name = na + ".png"
    mtl_path = os.path.join(fol, na + ".mtl")
    with open(mtl_path, "w") as fid:
        fid.write(
            "newmtl material_0\nKd 1 1 1\nKa 0 0 0\nKs 0.4 0.4 0.4\n"
            f"Ns 10\nillum 2\nmap_Kd {texture_name}\n"
        )
    v = np.asarray(vertices, dtype=np.float64)
    vt = np.asarray(uvs, dtype=np.float64)
    fv = np.asarray(faces, dtype=np.int64) + 1
    ft = np.asarray(face_uv_idx, dtype=np.int64) + 1
    # one %-format per block on flat python lists (not per-row numpy
    # scalar indexing) — ~10x faster text build on the 1-core hosts
    fidx = np.empty((len(fv), 6), np.int64)
    fidx[:, 0::2], fidx[:, 1::2] = fv, ft
    body = "".join([
        f"mtllib {na}.mtl\n",
        ("v %f %f %f\n" * len(v)) % tuple(v.ravel().tolist()),
        ("vt %f %f\n" * len(vt)) % tuple(vt.ravel().tolist()),
        "usemtl material_0\n",
        ("f %d/%d %d/%d %d/%d\n" * len(fv)) % tuple(fidx.ravel().tolist()),
    ])
    with open(obj_path, "w") as fid:
        fid.write(body)


def save_obj(vertices: np.ndarray, faces: np.ndarray, path: str) -> None:
    """Plain v/f OBJ (reference utils_3d.py:12-24)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    v = np.asarray(vertices, dtype=np.float64)
    fv = np.asarray(faces, dtype=np.int64) + 1
    body = (("v %f %f %f\n" * len(v)) % tuple(v.ravel().tolist())
            + ("f %d %d %d\n" * len(fv)) % tuple(fv.ravel().tolist()))
    with open(path, "w") as fid:
        fid.write(body)


def load_obj(path: str) -> Dict[str, np.ndarray]:
    """Minimal OBJ loader: v, vt, f (v or v/vt or v/vt/vn); triangulates fans.

    Replacement for kaolin.io.obj.import_mesh (reference demo.py:395).
    """
    verts, uvs, faces, face_uv = [], [], [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v":
                verts.append([float(x) for x in tok[1:4]])
            elif tok[0] == "vt":
                uvs.append([float(x) for x in tok[1:3]])
            elif tok[0] == "f":
                idx = []
                for w in tok[1:]:
                    parts = w.split("/")
                    vi = int(parts[0])
                    ti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
                    idx.append((vi, ti))
                for i in range(1, len(idx) - 1):  # fan triangulation
                    tri = [idx[0], idx[i], idx[i + 1]]
                    faces.append([t[0] - 1 if t[0] > 0 else len(verts) + t[0]
                                  for t in tri])
                    face_uv.append([t[1] - 1 for t in tri])
    out = {
        "vertices": np.asarray(verts, dtype=np.float32),
        "faces": np.asarray(faces, dtype=np.int64),
    }
    if uvs:
        out["uvs"] = np.asarray(uvs, dtype=np.float32)
        out["face_uv_idx"] = np.asarray(face_uv, dtype=np.int64)
    return out


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def save_rgb(img01: np.ndarray, path: str, flip_vertical: bool = False) -> None:
    """Save an HWC (or CHW) float [0,1] image as RGB PNG
    (reference utils/utils_2d.py:351 save_CHW_RGB_img, stored row 0 = top)."""
    if type(img01).__module__.startswith("jax"):
        # quantize on device: a 1024^2 float32 atlas is 12 MB over the
        # host link, the uint8 image 3 MB (4x faster export)
        import jax.numpy as jnp

        img01 = jnp.clip(img01 * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
        img = np.asarray(img01)
        pre_quantized = True
    else:
        img = np.asarray(img01)
        pre_quantized = img.dtype == np.uint8
    if img.ndim == 3 and img.shape[0] in (3, 4) and img.shape[-1] not in (3, 4):
        img = np.transpose(img, (1, 2, 0))
    if flip_vertical:
        img = img[::-1]
    if pre_quantized:
        arr = img
    else:
        arr = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # cv2 + RLE strategy: ~2x faster than PIL at compress_level 1 with
    # comparable file sizes — the export stage is wall-clock-visible per
    # shape (PIL fallback keeps minimal installs working).  HWC RGB/RGBA
    # only: the channel flip below would mirror a 2D array's width.
    if arr.ndim == 3 and arr.shape[-1] in (3, 4):
        try:
            import cv2

            bgr = arr[..., [2, 1, 0, 3]] if arr.shape[-1] == 4 \
                else arr[..., ::-1]
            if cv2.imwrite(path, np.ascontiguousarray(bgr),
                           [cv2.IMWRITE_PNG_COMPRESSION, 1,
                            cv2.IMWRITE_PNG_STRATEGY,
                            cv2.IMWRITE_PNG_STRATEGY_RLE]):
                return
        except Exception:
            pass
    mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
    Image.fromarray(np.ascontiguousarray(arr), mode).save(
        path, compress_level=1)


def fetch_bool(mask) -> np.ndarray:
    """Device bool array -> host numpy bool, transferred as packed bits.

    A [1024,1024] bool is 1 MB over the ~14 MB/s tunnel link (~70 ms);
    packed it is 128 KB.  Falls back to a plain fetch for numpy inputs
    or sizes not divisible by 8."""
    if not type(mask).__module__.startswith("jax"):
        return np.asarray(mask, bool)
    import jax.numpy as jnp

    shape = mask.shape
    n = int(np.prod(shape))
    if n % 8:
        return np.asarray(mask).astype(bool)
    w = jnp.array([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    packed = (mask.reshape(-1, 8).astype(jnp.uint8) * w).sum(
        axis=-1).astype(jnp.uint8)
    bits = np.unpackbits(np.asarray(packed), bitorder="little")
    return bits.astype(bool).reshape(shape)


_ASYNC_IO = None
_PENDING: list = []


def _async_executor():
    global _ASYNC_IO
    if _ASYNC_IO is None:
        from concurrent.futures import ThreadPoolExecutor

        _ASYNC_IO = ThreadPoolExecutor(max_workers=1,
                                       thread_name_prefix="pd-io")
    return _ASYNC_IO


def submit_async_io(fn) -> None:
    """Queue an arbitrary IO callable on the background writer thread
    (device fetches release the GIL, cv2 PNG encodes too — CPU text work
    on the main thread genuinely overlaps).  Pair with flush_async_io()."""
    _PENDING.append(_async_executor().submit(fn))


def save_rgb_stack_async(imgs, paths, flip_vertical: bool = False) -> None:
    """Write a [V,H,W,3] float image stack as V PNGs without stalling the
    pipeline: quantize to uint8 on device, then ONE device->host transfer
    + the PNG encodes run on a background thread (on the single-core
    tunnel hosts the per-image save loop cost >1 s of round trips inside
    a device-bound stage).  Call `flush_async_io()` before reading the
    files back or returning to the user."""
    if type(imgs).__module__.startswith("jax"):
        import jax.numpy as jnp

        imgs = jnp.clip(imgs * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)

    def work(stack=imgs, ps=tuple(paths), flip=flip_vertical):
        arr = np.asarray(stack)
        for a, p in zip(arr, ps):
            save_rgb(a, p, flip)

    _PENDING.append(_async_executor().submit(work))


def flush_async_io() -> None:
    """Block until every queued async image write has completed;
    re-raises the first writer error."""
    err = None
    while _PENDING:
        fut = _PENDING.pop()
        try:
            fut.result()
        except Exception as e:      # keep draining, report one
            err = e
    if err is not None:
        raise err


def load_rgb(path: str) -> np.ndarray:
    """Load PNG -> HWC float32 in [0,1] (RGB; alpha dropped)."""
    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)
    return img / 255.0


def load_rgba(path: str) -> np.ndarray:
    img = np.asarray(Image.open(path).convert("RGBA"), dtype=np.float32)
    return img / 255.0
