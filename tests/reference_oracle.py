"""Golden oracles: run the REFERENCE's own torch pipeline math on CPU.

The reference modules import kaolin/nvdiffrast/open3d at module level
(unavailable here), so we AST-extract just the named pure-torch functions
from /root/reference sources and exec them with:
  - the real libraries they use that ARE installed (torch, numpy, scipy,
    cv2),
  - two documented shims for CUDA-only library calls:
      * kal.metrics.pointcloud.sided_distance -> exact torch.cdist NN
        (identical math; the kaolin CUDA kernel computes the same
        squared-L2 nearest neighbor),
      * torchvision transforms Resize/Pad -> F.interpolate + F.pad
        (used only on the shrink-to-fit foreground mask).

This executes reference code verbatim as a numerical oracle — it is NOT
part of the shipped framework, and the sources are treated as untrusted
data (functions are extracted by name; no module-level code runs).
"""
from __future__ import annotations

import ast
import math
import os

import numpy as np
import torch
import torch.nn.functional as F
from scipy.interpolate import griddata

REF = "/root/reference"


def _extract(relpath: str, names):
    """Compile the named functions from a reference source file.

    Looks for FunctionDefs at module level AND inside classes (methods are
    lifted to plain functions — callers pass an explicit `self`)."""
    with open(os.path.join(REF, relpath)) as f:
        tree = ast.parse(f.read())
    wanted = set(names)
    body = []
    for n in tree.body:
        if isinstance(n, ast.FunctionDef) and n.name in wanted:
            body.append(n)
        elif isinstance(n, ast.ClassDef):
            body.extend(m for m in n.body
                        if isinstance(m, ast.FunctionDef) and m.name in wanted)
    got = {n.name for n in body}
    assert got == wanted, f"missing {wanted - got} in {relpath}"
    mod = ast.Module(body=body, type_ignores=[])
    ast.fix_missing_locations(mod)
    return compile(mod, os.path.join(REF, relpath), "exec")


def _extract_stmt_range(relpath, funcname, lo, hi, argnames, retnames,
                        newname):
    """Lift a verbatim statement range out of a reference function whose
    surrounding code needs unavailable libraries (nvdiffrast, kiui, ...):
    wrap the statements in a new function taking `argnames` and returning
    `retnames`.  No reference line is rewritten — only re-scoped."""
    with open(os.path.join(REF, relpath)) as f:
        tree = ast.parse(f.read())
    fn = next((n for n in ast.walk(tree)
               if isinstance(n, ast.FunctionDef) and n.name == funcname),
              None)
    assert fn is not None, f"{funcname} not found in {relpath}"
    def collect(body):
        """Statements fully inside [lo, hi]; descend into compound
        statements (with/if/for) that only partially overlap."""
        out = []
        for s in body:
            end = s.end_lineno or s.lineno
            if s.lineno >= lo and end <= hi:
                out.append(s)
            elif s.lineno <= hi and end >= lo:
                for field in ("body", "orelse", "finalbody"):
                    out.extend(collect(getattr(s, field, []) or []))
        return out

    stmts = collect(fn.body)
    assert stmts, f"no statements in {relpath}:{funcname} lines {lo}-{hi}"
    ret = ast.Return(value=ast.Tuple(
        elts=[ast.Name(id=r, ctx=ast.Load()) for r in retnames],
        ctx=ast.Load()))
    newfn = ast.FunctionDef(
        name=newname,
        args=ast.arguments(posonlyargs=[],
                           args=[ast.arg(arg=a) for a in argnames],
                           kwonlyargs=[], kw_defaults=[], defaults=[]),
        body=stmts + [ret], decorator_list=[])
    mod = ast.Module(body=[newfn], type_ignores=[])
    ast.fix_missing_locations(mod)
    return compile(mod, os.path.join(REF, relpath), "exec")


def load_view_select_oracle():
    """NBF candidate fallback + softmax view selection, verbatim from
    pointdreamer/unproject.py:324-367 (inside unproject(); the rest of
    that function needs nvdiffrast/kiui).  Call as
      ns['select'](per_kernel_vis, per_pixel_mask, edge_dilate_kernels,
                   per_view_per_point_visibility, similarity,
                   complete_unseen_by_projection)
    -> (point_view_ids, candidate_per_point_per_view_mask)."""
    import sys
    import types

    if "kiui" not in sys.modules:  # the range contains `import kiui`
        stub = types.ModuleType("kiui")
        stub.lo = lambda *a, **k: None
        sys.modules["kiui"] = stub
    ns = {"torch": torch, "np": np, "print": lambda *a, **k: None}
    exec(_extract_stmt_range(
        "pointdreamer/unproject.py", "unproject", 324, 367,
        ["per_kernel_per_view_shrinked_per_pixel_visibility",
         "per_pixel_mask", "edge_dilate_kernels",
         "per_view_per_point_visibility",
         "similarity_between_point_normal_and_view_dir",
         "complete_unseen_by_projection", "per_point_face_normal"],
        ["point_view_ids", "candidate_per_point_per_view_mask"],
        "select"), ns)
    return ns


def load_crop_rescale_oracle():
    """The shrink-to-fit crop bookkeeping, verbatim from
    pointdreamer/ours_utils.py:110-141 (inside
    get_rendered_hard_mask_and_face_idx_batch; the rest needs nvdiffrast).
      ns['crop'](pos, transformed_points, rescale, padding)
    -> (vertice_uvs, point_uvs, uv_centers, uv_scales, point_depths, pos)."""
    ns = {"torch": torch, "np": np}
    exec(_extract_stmt_range(
        "pointdreamer/ours_utils.py",
        "get_rendered_hard_mask_and_face_idx_batch", 110, 141,
        ["pos", "transformed_points", "rescale", "padding"],
        ["vertice_uvs", "point_uvs", "uv_centers", "uv_scales",
         "point_depths", "pos"], "crop"), ns)
    return ns


class _SidedDistance:
    """kaolin.metrics.pointcloud.sided_distance shim (exact squared-L2 NN)."""

    @staticmethod
    def sided_distance(p1, p2):
        d = torch.cdist(p1.float(), p2.float()) ** 2
        dist, idx = d.min(dim=2)
        return dist, idx


class _Kal:
    class metrics:
        pointcloud = _SidedDistance


class _Resize:
    def __init__(self, size):
        self.size = tuple(size) if not isinstance(size, int) else (size, size)

    def __call__(self, x):
        y = F.interpolate(x.float().unsqueeze(0), size=self.size,
                          mode="nearest").squeeze(0)
        return y


class _Pad:
    """torchvision Pad semantics for a 2-tuple: (horizontal, vertical),
    applied to both sides."""

    def __init__(self, padding, fill=0):
        if isinstance(padding, int):
            padding = (padding, padding)
        self.ph, self.pv = int(padding[0]), int(padding[1])
        self.fill = fill

    def __call__(self, x):
        return F.pad(x, (self.ph, self.ph, self.pv, self.pv),
                     value=self.fill)


class _Compose:
    def __init__(self, ops):
        self.ops = ops

    def __call__(self, x):
        for op in self.ops:
            x = op(x)
        return x


class _Transforms:
    Resize = _Resize
    Pad = _Pad
    Compose = _Compose


def load_oracles():
    """Returns a namespace dict with the extracted reference functions."""
    ns = {
        "torch": torch, "np": np, "F": F, "os": os, "math": math,
        "griddata": griddata, "kal": _Kal, "transforms": _Transforms,
        "cv2": None,  # referenced only in dead/vis branches
    }
    exec(_extract("utils/utils_2d.py",
                  ["detect_edges_in_gray_by_scharr_torch_batch",
                   "dilate_torch_batch"]), ns)
    exec(_extract("pointdreamer/ours_utils.py",
                  ["paint_pixels", "get_forground_inner_edge_mask",
                   "naive_inpainting", "get_one_sparse_img",
                   "get_point_validation_by_depth"]), ns)
    exec(_extract("pointdreamer/unproject.py",
                  ["get_shrinked_per_view_per_pixel_visibility_torch",
                   "dilate_atlas"]), ns)
    return ns


def load_face_assign_oracle():
    """The `unproject_by='face'` assignment machinery, verbatim
    (ours_utils.py:659-846): create_neighbors_tensor, per-face-per-view
    pixel counts, visible-face assignment by masked normal similarity,
    neighbor label propagation + smoothing, and the per-corner uv gather."""
    ns = {"torch": torch, "np": np, "print": lambda *a, **k: None}
    exec(_extract("pointdreamer/ours_utils.py",
                  ["create_neighbors_tensor", "get_face_view_pixel_num",
                   "assign_labels_to_invalid_by_most_neighbors",
                   "smooth_labels_by_neighbors", "assign_face_view",
                   "get_face_vertice_uvs"]), ns)
    return ns


def load_subdivide_oracle():
    """utils/mesh_utils.py:7-114 subdivide_with_uv verbatim, with two
    documented shims for the (uninstalled) trimesh helpers it imports:
      * faces_to_edges  -> faces[:, [0,1,1,2,2,0]].reshape(-1,2)
        (trimesh.geometry.faces_to_edges's exact construction)
      * grouping.unique_rows -> np.unique(axis=0, return_index/inverse)
        (same (unique_indices, inverse) contract; unique ordering is
        lexicographic instead of hash-sorted, which only permutes the
        new-vertex numbering, not the produced geometry)"""
    import types

    def faces_to_edges(faces):
        return np.asarray(faces)[:, [0, 1, 1, 2, 2, 0]].reshape((-1, 2))

    def unique_rows(data, **kw):
        _, unique, inverse = np.unique(np.asarray(data), axis=0,
                                       return_index=True,
                                       return_inverse=True)
        return unique, inverse.reshape(-1)

    grouping = types.SimpleNamespace(unique_rows=unique_rows)
    ns = {"torch": torch, "np": np, "faces_to_edges": faces_to_edges,
          "grouping": grouping}
    exec(_extract("utils/mesh_utils.py", ["subdivide_with_uv"]), ns)
    return ns


class _UniformLaplacian:
    """kaolin.ops.mesh.uniform_laplacian shim: sparse [V,V] with
    L[i,j] = 1/deg(i) for every edge-neighbor j and L[i,i] = -1 —
    kaolin's documented semantics (the reference adds the identity, so
    only the off-diagonal row-normalized adjacency survives)."""

    @staticmethod
    def uniform_laplacian(V, faces):
        f = faces.long()
        e = torch.cat([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], dim=0)
        e = torch.cat([e, e.flip(1)], dim=0)
        e = torch.unique(e, dim=0)
        deg = torch.zeros(V).index_add_(0, e[:, 0],
                                        torch.ones(len(e)))
        vals = 1.0 / deg.clamp(min=1)[e[:, 0]]
        idx = torch.cat([e.t(), torch.arange(V).repeat(2, 1)], dim=1)
        v = torch.cat([vals, -torch.ones(V)])
        return torch.sparse_coo_tensor(idx, v, size=(V, V)).coalesce()


class _KalMesh:
    class ops:
        mesh = _UniformLaplacian


def load_paint_invisible_oracle():
    """pointdreamer/unproject.py:93-196 paint_invisible_areas_by_neighbors
    + compute_vertex_only_uv_mask verbatim, with the subdivide oracle's
    trimesh shims, the uniform-laplacian shim above, a no-op tqdm, and
    the reference's own naive_inpainting (ours_utils.py)."""
    import sys
    import types

    sub = load_subdivide_oracle()
    if "tqdm" not in sys.modules:
        mod = types.ModuleType("tqdm")

        class _T:
            def __init__(self, *a, **k):
                pass

            def update(self, *a):
                pass

        mod.tqdm = _T
        sys.modules["tqdm"] = mod
    ns = {"torch": torch, "np": np, "kal": _KalMesh,
          "subdivide_with_uv": sub["subdivide_with_uv"],
          "griddata": griddata, "cv2": None,
          "print": lambda *a, **k: None}
    exec(_extract("pointdreamer/ours_utils.py", ["naive_inpainting"]), ns)
    exec(_extract("pointdreamer/unproject.py",
                  ["paint_invisible_areas_by_neighbors",
                   "compute_vertex_only_uv_mask"]), ns)
    return ns


def load_laplacian_diffusion_oracle():
    """JUST the Unique3D-style Laplacian color-diffusion loop, verbatim
    from paint_invisible_areas_by_neighbors (unproject.py:142-180): grow
    colors from the valid set across mesh edges until saturation, then
    smooth for as many extra rounds as growth took.  Call as
      ns['diffuse'](subdevided_vert_colors, valid_index,
                    subdivided_faces, device) -> colors
    (uniform_laplacian + tqdm shimmed as in load_paint_invisible_oracle)."""
    import sys
    import types

    if "tqdm" not in sys.modules:
        mod = types.ModuleType("tqdm")

        class _T:
            def __init__(self, *a, **k):
                pass

            def update(self, *a):
                pass

        mod.tqdm = _T
        sys.modules["tqdm"] = mod
    ns = {"torch": torch, "np": np, "kal": _KalMesh,
          "print": lambda *a, **k: None}
    exec(_extract_stmt_range(
        "pointdreamer/unproject.py", "paint_invisible_areas_by_neighbors",
        142, 180,
        ["subdevided_vert_colors", "valid_index", "subdivided_faces",
         "device"],
        ["colors"], "diffuse"), ns)
    return ns


class _TorchProxy:
    """`torch` stand-in whose randn/randn_like pop from a pre-generated
    noise sequence — lets the oracle and the jax sampler consume the SAME
    noise stream.  Everything else delegates to the real torch module."""

    def __init__(self, noise_seq):
        self._noise = list(noise_seq)

    def randn(self, *shape, **kw):
        z = torch.from_numpy(self._noise.pop(0)).float()
        assert tuple(z.shape) == tuple(shape), (z.shape, shape)
        return z

    def randn_like(self, x):
        z = torch.from_numpy(self._noise.pop(0)).float()
        assert z.shape == x.shape, (z.shape, x.shape)
        return z

    def __getattr__(self, name):
        return getattr(torch, name)


def load_ddnm_oracle(noise_seq):
    """Extract the reference DDNM sampler + its helpers verbatim
    (models/DDNM/guided_diffusion/diffusion.py:459-570,770-812 and
    datasets/__init__.py:208-236).  `simplified_ddnm_inpainting` is a
    method — call it as ns['simplified_ddnm_inpainting'](fake_self, ...).
    randn/randn_like inside consume `noise_seq` (numpy arrays, in draw
    order) via a torch proxy so the trajectory is deterministic."""
    ns = {
        "torch": _TorchProxy(noise_seq), "np": np, "os": os, "math": math,
        # the sampler's imported-from-elsewhere names, extracted too:
    }
    exec(_extract("models/DDNM/guided_diffusion/diffusion.py",
                  ["simplified_ddnm_inpainting", "get_schedule_jump",
                   "_check_times", "compute_alpha", "get_beta_schedule"]),
         ns)
    exec(_extract("models/DDNM/datasets/__init__.py",
                  ["data_transform", "inverse_data_transform",
                   "logit_transform"]), ns)
    return ns
