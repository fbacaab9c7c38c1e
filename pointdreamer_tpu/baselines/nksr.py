"""Kernel-field surface reconstruction baseline (the NKSR model class).

Reference: baselines/NKSR.py — normalizes a colored cloud, estimates
normals (pymeshlab `compute_normal_for_point_clouds`, NKSR.py:150-155),
fits a kernel field with `nksr.Reconstructor.reconstruct` (a pretrained
NEURAL kernel), attaches a `PCNNField` nearest-point color field
(NKSR.py:160-163), extracts a refined dual mesh (`mise_iter=2`), and
writes a vertex-colored obj/ply pair (NKSR.py:168-189).

NKSR's model class is kernel regression over point-centered basis
functions: f(x) = sum_j alpha_j K(x, c_j), alpha solved from on/off
surface constraints — the learned part is only WHICH kernel.  No
pretrained kernel exists offline, so this module implements the same
model class with the analytic BIHARMONIC kernel phi(r) = r plus a
linear polynomial tail (Carr et al. 2001 RBF reconstruction, NKSR's
non-learned ancestor; a decaying kernel is unusable here — its far
field returns to the zero iso level and marching cubes finds a
spurious outer shell).  Designed TPU-first:

  - centers  = voxel-stride subsample of the cloud (+ uniform random
    supplement up to the budget) and their +eps normal offsets;
  - constraints = INTERPOLATION at the centers themselves: f(p)=0,
    f(p + eps n)=+eps, plus far-field ring points pinned to their
    (positive) distance to the cloud so the polynomial tail is
    SDF-like at the grid boundary (Carr et al. '01; a ridge
    least-squares variant measurably collapsed the signed offsets —
    see fit_kernel_field);
  - solve    = direct float64 LU of the square saddle system
    [K P; P^T 0] (the biharmonic kernel is conditionally positive
    definite; the polynomial block makes the system nonsingular);
    field EVALUATION streams [chunk, N] kernel blocks built from one
    MXU matmul (|x-c|^2 via x.c) and a fused sqrt, so memory stays
    O(N) while the FLOPs stay in the MXU;
  - extraction = dense grid eval (same streaming matmul) + the repo's
    256-case marching cubes; `mise_iter` maps to Newton refinement of
    iso-vertices against the continuous kernel field;
  - color    = kNN inverse-distance interpolation of the input cloud's
    colors at the mesh vertices (the PCNN color field's math).

`recon_one_shape_NKSR` replaces the round-2 NotImplementedError stub;
`python -m pointdreamer_tpu.cli.nksr_baseline` mirrors the reference
CLI surface (file-or-directory input, output_baseline/NKSR layout).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["fit_kernel_field", "recon_one_shape_NKSR"]


# --------------------------------------------------------------------------
# streaming kernel matvecs
# --------------------------------------------------------------------------

def _phi_block(x, c):
    """Biharmonic kernel block phi(|x-c|) = |x-c| without materializing
    differences: |x-c|^2 = |x|^2 - 2 x.c + |c|^2 — one MXU matmul plus
    rank-1 terms, then a fused sqrt."""
    import jax.numpy as jnp

    d2 = (jnp.sum(x * x, -1, keepdims=True)
          - 2.0 * (x @ c.T)
          + jnp.sum(c * c, -1)[None, :])
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def _make_matvecs(X, C, chunk: int):
    """Design matrix A = [phi(X, C) | 1 | X]  (shape [M, N+4], never
    materialized).  Returns (Av, ATu): v [N+4] -> A v [M] and
    u [M] -> A^T u [N+4], streamed in [chunk, N] blocks."""
    import jax
    import jax.numpy as jnp

    M, N = X.shape[0], C.shape[0]
    n_chunks = -(-M // chunk)
    pad = n_chunks * chunk - M
    Xp = jnp.pad(X, ((0, pad), (0, 0)))
    Xb = Xp.reshape(n_chunks, chunk, 3)

    @jax.jit
    def Av(v):
        a, b = v[:N], v[N:]

        def body(_, xb):
            return None, (_phi_block(xb, C) @ a + b[0] + xb @ b[1:])
        _, out = jax.lax.scan(body, None, Xb)
        return out.reshape(-1)[:M]

    @jax.jit
    def ATu(u):
        up = jnp.pad(u, (0, pad)).reshape(n_chunks, chunk)

        def body(acc, xu):
            xb, ub = xu
            ka = acc[0] + _phi_block(xb, C).T @ ub
            kb = acc[1] + jnp.concatenate([ub.sum()[None], xb.T @ ub])
            return (ka, kb), None
        (ka, kb), _ = jax.lax.scan(
            body, (jnp.zeros(N, X.dtype), jnp.zeros(4, X.dtype)), (Xb, up))
        return jnp.concatenate([ka, kb])

    @jax.jit
    def col_sumsq():
        """diag(A^T A) — the Jacobi preconditioner for the CG solve.
        One extra streamed pass (padding rows contribute phi(0,C)^2 per
        pad row; subtract them exactly)."""
        def body(acc, xb):
            ph = _phi_block(xb, C)
            ka = acc[0] + jnp.sum(ph * ph, axis=0)
            kb = acc[1] + jnp.concatenate(
                [jnp.array([xb.shape[0]], X.dtype),
                 jnp.sum(xb * xb, axis=0)])
            return (ka, kb), None
        (ka, kb), _ = jax.lax.scan(
            body, (jnp.zeros(N, X.dtype), jnp.zeros(4, X.dtype)), Xb)
        if pad:
            ph0 = _phi_block(jnp.zeros((1, 3), X.dtype), C)[0]
            ka = ka - pad * ph0 * ph0
            kb = kb - jnp.array([pad, 0, 0, 0], X.dtype)
        return jnp.concatenate([ka, kb])

    return Av, ATu, col_sumsq


def _subsample_centers(pts: np.ndarray, max_centers: int,
                       seed: int = 0) -> np.ndarray:
    """Voxel-stride subsample INDICES: one representative per occupied
    voxel at the finest resolution that yields <= max_centers cells (NKSR
    builds its sparse basis on a voxel hierarchy; one level suffices for
    a single analytic kernel)."""
    if len(pts) <= max_centers:
        return np.arange(len(pts))
    lo, hi = pts.min(0) - 1e-6, pts.max(0) + 1e-6
    best = None
    res = 16
    while res < 512:
        cell = np.floor((pts - lo) / (hi - lo) * res).astype(np.int64)
        key = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
        uniq, first = np.unique(key, return_index=True)
        if len(uniq) > max_centers:
            break
        best = first
        res *= 2
    if best is None:  # even 16^3 overflows: random fallback
        rng = np.random.default_rng(seed)
        return rng.choice(len(pts), max_centers, replace=False)
    if len(best) > max_centers:
        rng = np.random.default_rng(seed)
        best = rng.choice(best, max_centers, replace=False)
    elif len(best) < max_centers:
        # the voxel ladder quadruples per level and can undershoot the
        # budget badly (clock: 1073 of 3072); spend the remainder on a
        # uniform random supplement so surface detail scales with the
        # budget, not with where the ladder happened to land
        rng = np.random.default_rng(seed)
        rest = np.setdiff1d(np.arange(len(pts)), best)
        extra = rng.choice(rest, min(max_centers - len(best), len(rest)),
                           replace=False)
        best = np.concatenate([best, extra])
    return best


def fit_kernel_field(xyz: np.ndarray, normals: np.ndarray,
                     max_centers: int = 3072,
                     eps: float = 0.005, n_far: int = 128,
                     smooth: float = 0.0,
                     chunk: int = 4096, seed: int = 0):
    """Fit f(x) = sum_j alpha_j |x - c_j| + b0 + b.x to the oriented
    cloud; returns (field_fn [M,3]->[M] (positive outside), centers).

    INTERPOLATION, not ridge regression (Carr et al. '01): the kernel
    nodes ARE the constraint points — f = 0 at the on-surface subsample,
    f = +eps at p + eps n, f = +dist(q, nodes) at far ring points q —
    and the square saddle system

        [ K + smooth*I   P ] [alpha]   [b]
        [     P^T        0 ] [beta ] = [0],   P = [1 | x]

    is solved directly (float64 LU; the biharmonic kernel is only
    conditionally positive definite, the polynomial constraint makes the
    saddle system nonsingular).  The round-4 ridge least-squares
    formulation measurably COLLAPSED the signed offsets: with ~6e-3
    ridge over 24k rows the minimizer returned f~0(+-0.01 noise) on both
    sides of the surface (39% sign correctness at +-eps on clock.ply ->
    F@0.01 0.24); interpolation pins f exactly and lifts clock to ~0.9+.
    Evaluation stays streamed/MXU via the [phi | 1 | x] design matvec.
    """
    import jax.numpy as jnp

    pts = np.asarray(xyz, np.float32)
    nrm = np.asarray(normals, np.float32)
    idx = _subsample_centers(pts, max_centers, seed)
    p, n = pts[idx], nrm[idx]

    # far-field ring: radius ~1.4x the cloud's bounding radius
    rng = np.random.default_rng(seed + 1)
    center = pts.mean(0)
    rad = float(np.linalg.norm(pts - center, axis=1).max())
    d = rng.standard_normal((n_far, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    far = center + d * (1.4 * rad)
    from ..ops.knn import knn as _knn
    fd2, _ = _knn(jnp.asarray(far), jnp.asarray(p), k=1)
    far_val = np.sqrt(np.asarray(fd2)[:, 0])

    nodes = np.concatenate([p, p + eps * n, far]).astype(np.float32)
    b = np.concatenate([np.zeros(len(p)), np.full(len(p), eps),
                        far_val]).astype(np.float64)
    M = len(nodes)

    # dense [M,M] kernel matrix built on device in [chunk,M] blocks
    nj = jnp.asarray(nodes)
    K = np.asarray(_phi_block(nj, nj), np.float64)
    if smooth:
        K += smooth * np.eye(M)
    P = np.concatenate([np.ones((M, 1)), nodes.astype(np.float64)], 1)
    A = np.zeros((M + 4, M + 4))
    A[:M, :M] = K
    A[:M, M:] = P
    A[M:, :M] = P.T
    rhs = np.concatenate([b, np.zeros(4)])
    sol = np.linalg.solve(A, rhs)
    # design-matrix layout [phi | 1 | x] (matches _make_matvecs)
    w = jnp.asarray(np.concatenate([sol[:M], sol[M:]]), jnp.float32)
    Cj = nj

    def field_fn(q_pts):
        """[M,3] -> [M]; positive outside (pipeline convention)."""
        qj = jnp.asarray(np.asarray(q_pts, np.float32))
        Aq, _, _ = _make_matvecs(qj, Cj, chunk)
        return np.asarray(Aq(w))

    return field_fn, np.asarray(nodes)


def recon_one_shape_NKSR(xyz: np.ndarray, rgb01: Optional[np.ndarray] = None,
                         grid_res: int = 128, simplify_face_num: int = 0,
                         mise_iter: int = 2, color_knn: int = 3,
                         max_centers: int = 4096, **fit_kw,
                         ) -> Tuple[np.ndarray, np.ndarray,
                                    Optional[np.ndarray]]:
    """Colored cloud (normalized to [-0.5, 0.5]) -> (verts, faces,
    vertex_colors or None).  Mirrors the reference flow NKSR.py:96-168:
    estimate normals, fit the kernel field, extract + refine, color.
    Extra kwargs go to fit_kernel_field (eps, ridge, cg_iters, ...)."""
    import jax.numpy as jnp

    from ..ops import iso as oiso
    from ..ops import knn as oknn
    from ..ops.sdf import estimate_oriented_normals

    pts = np.asarray(xyz, np.float32)
    normals = estimate_oriented_normals(pts)
    field_fn, _ = fit_kernel_field(pts, normals, max_centers=max_centers,
                                   **fit_kw)

    lo, hi = -0.6, 0.6
    axis = np.linspace(lo, hi, grid_res, dtype=np.float32)
    g = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"),
                 -1).reshape(-1, 3)
    vals = field_fn(g).reshape(grid_res, grid_res, grid_res)
    verts, faces = oiso.marching_cubes(jnp.asarray(vals),
                                       jnp.asarray(axis))
    verts, faces = np.asarray(verts), np.asarray(faces)

    if mise_iter > 0 and len(verts):
        # reference extract_dual_mesh(mise_iter=2): refine vertices
        # against the CONTINUOUS field — damped Newton along the
        # central-difference gradient, step bounded by half a cell
        h = (hi - lo) / (grid_res - 1)
        step = 0.5 * h
        offs = np.eye(3, dtype=np.float32) * (0.5 * h)
        for _ in range(mise_iter):
            f0 = field_fn(verts)
            grad = np.stack(
                [field_fn(verts + offs[i]) - field_fn(verts - offs[i])
                 for i in range(3)], -1) / h
            gn = grad / np.maximum(
                np.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
            gmag = np.maximum(np.linalg.norm(grad, axis=-1), 1e-9)
            verts = verts - gn * np.clip(f0 / gmag, -step, step)[:, None]
            step *= 0.5

    if len(faces):
        # the loosely-constrained band between the far ring and the
        # surface can carry spurious zero-crossing shells (measured on
        # clock.ply: accuracy 0.047 vs completeness 0.005 — phantom
        # geometry); keep the dominant component like the pipeline's own
        # geometry stage does
        from ..pipeline.geometry import largest_component
        verts, faces = largest_component(verts, faces)

    if simplify_face_num and len(faces) > simplify_face_num:
        from ..native import qem
        verts, faces = qem.simplify(verts, faces, simplify_face_num)

    colors = None
    if rgb01 is not None and len(verts):
        # PCNNField: interpolate input colors at the vertices (kNN IDW)
        d2, idx = oknn.knn(jnp.asarray(verts), jnp.asarray(pts),
                           k=color_knn)
        w = 1.0 / jnp.maximum(jnp.asarray(d2), 1e-12)
        w = w / w.sum(-1, keepdims=True)
        cols = jnp.asarray(np.asarray(rgb01, np.float32))[np.asarray(idx)]
        colors = np.asarray((np.asarray(w)[..., None] * cols).sum(1))

    return verts, faces, colors
