"""Degradation operators as spectral (SVD) transforms + the general
DDNM / DDNM+ samplers.

Reference: models/DDNM/functions/svd_operators.py (per-operator V/Vt/U/Ut/
singulars/Lambda/Lambda_noise classes, 1165 LoC of index bookkeeping) and
functions/svd_ddnm.py:19-165 (ddnm_diffusion / ddnm_plus_diffusion).

TPU re-design: every operator exposes just two maps — `to_spec` (V^T x)
and `from_spec` (V s) — plus its per-component singular values `s` laid
out in IMAGE shape.  Both DDNM update rules become elementwise formulas in
spectral coordinates (exactly the reference's Lambda/Lambda_noise math,
but written once instead of per operator), and the whole sampler is a
single `lax.scan`.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ddnm import compute_alpha, get_schedule_jump, make_betas


class SpectralOp(NamedTuple):
    """x_spec = to_spec(x); x = from_spec(x_spec); singulars broadcastable
    against x_spec.  y_spec = s^+ . to_spec_y(y) is computed by `pinv_y`."""

    to_spec: Callable
    from_spec: Callable
    singulars: jnp.ndarray

    def A(self, x):
        return self.from_spec(self.to_spec(x) * self.singulars)

    def A_pinv_spec(self, y_like_spec):
        s = self.singulars
        return jnp.where(s > 0, y_like_spec / jnp.where(s > 0, s, 1.0), 0.0)


# --------------------------------------------------------------------------
# operators (image layout [B, H, W, C])
# --------------------------------------------------------------------------

def inpainting_op(mask: jnp.ndarray) -> SpectralOp:
    """mask [H,W] or [H,W,1]: 1 = kept pixel (svd_operators.py:324)."""
    if mask.ndim == 2:
        mask = mask[..., None]
    return SpectralOp(to_spec=lambda x: x, from_spec=lambda x: x,
                      singulars=mask.astype(jnp.float32))


def colorization_op(h: int, w: int) -> SpectralOp:
    """rgb -> gray mean (svd_operators.py:627).  Spectral basis per pixel:
    v1 = (1,1,1)/sqrt(3) with s = 1/sqrt(3); two orthogonal chroma axes."""
    basis = np.array([
        [1, 1, 1],
        [1, -1, 0],
        [1, 1, -2],
    ], dtype=np.float64)
    basis /= np.linalg.norm(basis, axis=1, keepdims=True)
    Vt = jnp.asarray(basis, jnp.float32)             # rows are basis
    s = jnp.zeros((1, 1, 3)).at[..., 0].set(1.0 / np.sqrt(3.0))
    return SpectralOp(
        to_spec=lambda x: jnp.einsum("bhwc,kc->bhwk", x, Vt),
        from_spec=lambda z: jnp.einsum("bhwk,kc->bhwc", z, Vt),
        singulars=s,
    )


def super_resolution_op(h: int, w: int, ratio: int) -> SpectralOp:
    """block-average downsampling (svd_operators.py:479).  Per r^2 block:
    first spectral component = block mean direction, s = 1/r."""
    r2 = ratio * ratio
    A = np.full((1, r2), 1.0 / r2)
    _, S, Vh = np.linalg.svd(A, full_matrices=True)
    Vt_small = jnp.asarray(Vh, jnp.float32)          # [r2, r2]
    s = np.zeros(r2, np.float32)
    s[0] = S[0]                                      # = 1/ratio
    hb, wb = h // ratio, w // ratio

    def to_spec(x):
        b = x.shape[0]
        c = x.shape[-1]
        p = x.reshape(b, hb, ratio, wb, ratio, c)
        p = p.transpose(0, 1, 3, 5, 2, 4).reshape(b, hb, wb, c, r2)
        return jnp.einsum("bhwck,jk->bhwcj", p, Vt_small)

    def from_spec(z):
        b = z.shape[0]
        c = z.shape[3]
        p = jnp.einsum("bhwcj,jk->bhwck", z, Vt_small)
        p = p.reshape(b, hb, wb, c, ratio, ratio)
        return p.transpose(0, 1, 4, 2, 5, 3).reshape(
            b, hb * ratio, wb * ratio, c)

    return SpectralOp(to_spec=to_spec, from_spec=from_spec,
                      singulars=jnp.asarray(s)[None, None, None, None, :])


def deblurring_op(kernel1d: np.ndarray, h: int, w: int) -> SpectralOp:
    """separable convolution blur (svd_operators.py:934): A = H (x) H,
    SVD from the 1D circulant-ish convolution matrices."""
    k = np.asarray(kernel1d, np.float64)

    def conv_matrix(n):
        M = np.zeros((n, n))
        half = len(k) // 2
        for i in range(n):
            for j, kv in enumerate(k):
                col = i + j - half
                if 0 <= col < n:
                    M[i, col] += kv
        return M

    U1, S1, V1h = np.linalg.svd(conv_matrix(h))
    U2, S2, V2h = np.linalg.svd(conv_matrix(w))
    V1 = jnp.asarray(V1h.T, jnp.float32)
    V2 = jnp.asarray(V2h.T, jnp.float32)
    U1j = jnp.asarray(U1, jnp.float32)
    U2j = jnp.asarray(U2, jnp.float32)
    s = jnp.asarray(np.outer(S1, S2), jnp.float32)[None, :, :, None]
    # zero tiny singulars (reference ZeroBlur threshold)
    s = jnp.where(s > 1e-3, s, 0.0)

    def to_spec(x):  # V^T x: rows by V1^T, cols by V2^T
        y = jnp.einsum("ih,bhwc->biwc", V1.T, x)
        return jnp.einsum("jw,biwc->bijc", V2.T, y)

    def from_spec(z):
        y = jnp.einsum("hi,bijc->bhjc", V1, z)
        return jnp.einsum("wj,bhjc->bhwc", V2, y)

    # U is dropped: we define the degradation as A = V S V^T (same
    # information content as U S V^T — U is an output-space rotation that
    # DDNM never needs because y_spec = S^+ U^T y cancels it).
    del U1j, U2j
    return SpectralOp(to_spec=to_spec, from_spec=from_spec, singulars=s)


def compressed_sensing_op(h: int, w: int, ratio: float = 0.25,
                          block: int = 32, seed: int = 0) -> SpectralOp:
    """Block-wise compressed sensing (svd_operators.py:102-170 CS): per
    block x block patch, project onto a random orthonormal basis and keep
    the first `ratio` fraction of components."""
    rng = np.random.default_rng(seed)
    b2 = block * block
    q, _ = np.linalg.qr(rng.standard_normal((b2, b2)))
    Vt_small = jnp.asarray(q.T, jnp.float32)
    keep = int(b2 * ratio)
    s = np.zeros(b2, np.float32)
    s[:keep] = 1.0
    hb, wb = h // block, w // block

    def to_spec(x):
        b = x.shape[0]
        c = x.shape[-1]
        p = x.reshape(b, hb, block, wb, block, c)
        p = p.transpose(0, 1, 3, 5, 2, 4).reshape(b, hb, wb, c, b2)
        return jnp.einsum("bhwck,jk->bhwcj", p, Vt_small)

    def from_spec(z):
        b = z.shape[0]
        c = z.shape[3]
        p = jnp.einsum("bhwcj,jk->bhwck", z, Vt_small)
        p = p.reshape(b, hb, wb, c, block, block)
        return p.transpose(0, 1, 4, 2, 5, 3).reshape(b, hb * block,
                                                     wb * block, c)

    return SpectralOp(to_spec=to_spec, from_spec=from_spec,
                      singulars=jnp.asarray(s)[None, None, None, None, :])


def denoising_op() -> SpectralOp:
    """Identity degradation (svd_operators.py:442): pure denoising."""
    return SpectralOp(to_spec=lambda x: x, from_spec=lambda x: x,
                      singulars=jnp.ones((1, 1, 1), jnp.float32))


def _conv1d_matrix(k: np.ndarray, n: int) -> np.ndarray:
    """Dense 1D convolution matrix with zero boundary (svd_operators.py:934
    Deblurring builds the same band matrix)."""
    M = np.zeros((n, n))
    half = len(k) // 2
    for i in range(n):
        for j, kv in enumerate(k):
            col = i + j - half
            if 0 <= col < n:
                M[i, col] += kv
    return M


def _separable_spectral(M1: np.ndarray, M2: np.ndarray,
                        zero_thresh: float) -> SpectralOp:
    """SpectralOp for A = M1 (x) M2 acting on [B,H,W,C] images: SVD each
    1D factor, singulars are the outer product (Kronecker SVD), V-space
    maps are two small matmuls per side."""
    U1, S1, V1h = np.linalg.svd(M1, full_matrices=True)
    U2, S2, V2h = np.linalg.svd(M2, full_matrices=True)
    V1 = jnp.asarray(V1h.T, jnp.float32)
    V2 = jnp.asarray(V2h.T, jnp.float32)
    s1 = np.zeros(M1.shape[1]);  s1[:len(S1)] = S1
    s2 = np.zeros(M2.shape[1]);  s2[:len(S2)] = S2
    s = jnp.asarray(np.outer(s1, s2), jnp.float32)[None, :, :, None]
    s = jnp.where(s > zero_thresh, s, 0.0)

    def to_spec(x):
        y = jnp.einsum("ih,bhwc->biwc", V1.T, x)
        return jnp.einsum("jw,biwc->bijc", V2.T, y)

    def from_spec(z):
        y = jnp.einsum("hi,bijc->bhjc", V1, z)
        return jnp.einsum("wj,bhjc->bhwc", V2, y)

    return SpectralOp(to_spec=to_spec, from_spec=from_spec, singulars=s)


def deblurring2d_op(kernel_y: np.ndarray, kernel_x: np.ndarray,
                    h: int, w: int) -> SpectralOp:
    """Anisotropic separable blur, different kernels per axis
    (svd_operators.py:1094 Deblurring2D)."""
    return _separable_spectral(
        _conv1d_matrix(np.asarray(kernel_y, np.float64), h),
        _conv1d_matrix(np.asarray(kernel_x, np.float64), w),
        zero_thresh=2e-2)


def sr_conv_op(kernel1d: np.ndarray, h: int, w: int,
               ratio: int) -> SpectralOp:
    """Downsampling by strided convolution with reflective padding
    (svd_operators.py:851 SRConv): the 1D factor is the [n/r, n]
    stride-r convolution matrix; its full SVD gives an [n, n] V whose
    trailing n - n/r singulars are zero."""
    k = np.asarray(kernel1d, np.float64)
    k = k / k.sum()

    def sr_matrix(n):
        m = np.zeros((n // ratio, n))
        half = len(k) // 2
        for i in range(ratio // 2, n + ratio // 2, ratio):
            for j in range(i - half, i - half + len(k)):
                jj = j
                if jj < 0:
                    jj = -jj - 1                      # reflect low
                if jj >= n:
                    jj = (n - 1) - (jj - n)           # reflect high
                m[i // ratio, jj] += k[j - i + half]
        return m

    return _separable_spectral(sr_matrix(h), sr_matrix(w),
                               zero_thresh=3e-2)


def _fwht(a: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal fast Walsh-Hadamard transform along the last axis
    (self-inverse); length must be a power of two."""
    n = a.shape[-1]
    lead = a.shape[:-1]
    h = 1
    while h < n:
        a = a.reshape(lead + (-1, 2, h))
        a = jnp.concatenate([a[..., 0, :] + a[..., 1, :],
                             a[..., 0, :] - a[..., 1, :]], axis=-1)
        a = a.reshape(lead + (n,))
        h *= 2
    return a / np.sqrt(n)


def walsh_hadamard_cs_op(h: int, w: int, ratio: int = 4,
                         seed: int = 0) -> SpectralOp:
    """Walsh-Hadamard compressed sensing (svd_operators.py:211): keep the
    first n/ratio coefficients of a randomly permuted Hadamard transform
    of each channel plane.  V = WHT . perm (orthonormal, self-inverse up
    to the permutation), singulars 1 on kept components."""
    n = h * w
    assert n & (n - 1) == 0, "image pixel count must be a power of two"
    rng = np.random.default_rng(seed)
    perm = jnp.asarray(rng.permutation(n), jnp.int32)
    inv_perm = jnp.asarray(np.argsort(np.asarray(perm)), jnp.int32)
    keep = n // ratio
    s = jnp.asarray(
        (np.arange(n) < keep).astype(np.float32)).reshape(1, h, w, 1)

    def to_spec(x):  # V^T x = perm-gather of WHT(x)
        b, _, _, c = x.shape
        flat = x.transpose(0, 3, 1, 2).reshape(b, c, n)
        z = _fwht(flat)[:, :, perm]
        return z.reshape(b, c, h, w).transpose(0, 2, 3, 1)

    def from_spec(z):  # V z = WHT(scatter back through perm)
        b, _, _, c = z.shape
        flat = z.transpose(0, 3, 1, 2).reshape(b, c, n)
        x = _fwht(flat[:, :, inv_perm])
        return x.reshape(b, c, h, w).transpose(0, 2, 3, 1)

    return SpectralOp(to_spec=to_spec, from_spec=from_spec, singulars=s)


def general_a_op(A: np.ndarray, h: int, w: int, c: int = 3) -> SpectralOp:
    """Arbitrary dense degradation matrix A [m, h*w*c]
    (svd_operators.py:173 GeneralA): full SVD, zero-thresholded
    singulars, V-space maps are dense matmuls over the flattened image."""
    _, S, Vh = np.linalg.svd(np.asarray(A, np.float64), full_matrices=True)
    n = A.shape[1]
    assert n == h * w * c
    s = np.zeros(n, np.float32)
    S[S < 1e-3] = 0
    s[:len(S)] = S
    V = jnp.asarray(Vh.T, jnp.float32)

    def to_spec(x):
        return (x.reshape(x.shape[0], n) @ V).reshape(x.shape)

    def from_spec(z):
        return (z.reshape(z.shape[0], n) @ V.T).reshape(z.shape)

    return SpectralOp(to_spec=to_spec, from_spec=from_spec,
                      singulars=jnp.asarray(s).reshape(1, h, w, c))


def measure_spec(op: SpectralOp, x: jnp.ndarray) -> jnp.ndarray:
    """y_spec = S^+ U^T A x  ==  components of x observed through A,
    expressed in V-space (what the DDNM consistency step needs)."""
    return jnp.where(op.singulars > 0, op.to_spec(x), 0.0)


# --------------------------------------------------------------------------
# general DDNM / DDNM+ sampler
# --------------------------------------------------------------------------

def ddnm_lambda(s, a, sigma_y, sigma_t, eta):
    """Per-component data-consistency scaling Lambda (Eq. 17 generalized;
    reference svd_operators.py Lambda, e.g. Inpainting.Lambda).  Applied to
    the V-space residual, which is already zero on null (s==0) components.
    The observed/unobserved split only applies when sigma_y > 0 (the
    reference's `if a != 0 and sigma_y != 0` guard)."""
    inv_s = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    cond = (sigma_t < a * sigma_y * inv_s) & (s > 0) & (sigma_y > 0)
    lam = jnp.where(
        cond,
        s * sigma_t * jnp.sqrt(1 - eta ** 2) / jnp.maximum(
            a * sigma_y, 1e-12),
        jnp.where(s > 0, 1.0, 0.0))
    return lam, cond


def ddnm_noise_coeffs(s, cond, a, sigma_y, sigma_t, eta):
    """Per-component noise mixing (Eq. 51; reference Lambda_noise):
    returns (d1, d2) multiplying z ~ N(0,I) and the predicted epsilon in
    V-space.  At sigma_y == 0 this is plain DDNM noise d1 = sigma_t*eta,
    d2 = sigma_t*sqrt(1-eta^2) on every component (svd_ddnm.py:63-65)."""
    inv_s = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    d_null1 = sigma_t * eta
    d_null2 = sigma_t * jnp.sqrt(1 - eta ** 2)
    split = sigma_y > 0
    d1 = jnp.where(
        split & (s > 0),
        jnp.where(cond, sigma_t * eta,
                  jnp.sqrt(jnp.maximum(
                      sigma_t ** 2 - (a * sigma_y * inv_s) ** 2, 0.0))),
        d_null1)
    d2 = jnp.where(split & (s > 0), 0.0, d_null2)
    return d1, d2

@functools.partial(jax.jit,
                   static_argnames=("model", "op_factory", "t_sampling",
                                    "num_timesteps", "travel_length",
                                    "travel_repeat"))
def ddnm_plus_sample(
    model, params,
    y_img: jnp.ndarray,          # degraded observation, image layout
    op_factory,                  # () -> SpectralOp (static; closes arrays)
    rng_key,
    sigma_y: float = 0.0,
    t_sampling: int = 100,
    eta: float = 0.85,
    num_timesteps: int = 1000,
    travel_length: int = 1,
    travel_repeat: int = 1,
):
    """General DDNM+ (svd_ddnm.py:80-165); with sigma_y=0 it reduces to
    plain DDNM (svd_ddnm.py:19-78).  y_img is A(x) re-embedded in image
    space (i.e. from_spec(S . to_spec(x)))."""
    op = op_factory()
    B, H, W, C = y_img.shape
    s = op.singulars

    # observed spectral components: S^+ U^T y (in V coordinates)
    y_spec = op.A_pinv_spec(op.to_spec(y_img))

    skip = num_timesteps // t_sampling
    times = get_schedule_jump(t_sampling, travel_length, travel_repeat)
    pairs = np.array(list(zip(times[:-1], times[1:])), dtype=np.int64)
    is_forward = pairs[:, 1] < pairs[:, 0]
    i_steps = pairs[:, 0] * skip
    j_steps = np.where(pairs[:, 1] < 0, -1, pairs[:, 1] * skip)
    betas = make_betas(num_timesteps)
    at_arr = jnp.asarray(compute_alpha(betas, i_steps), jnp.float32)
    at_next_arr = jnp.asarray(compute_alpha(betas, j_steps), jnp.float32)
    t_arr = jnp.asarray(i_steps, jnp.float32)
    fwd_arr = jnp.asarray(is_forward)

    key, sub = jax.random.split(rng_key)
    x = jax.random.normal(sub, (B, H, W, C))

    def step(carry, inp):
        x, x0_prev, key = carry
        t, at, at_next, forward = inp
        key, k1, k2 = jax.random.split(key, 3)

        def forward_step(_):
            et = model.apply({"params": params}, x,
                             jnp.full((B,), t))[..., :3].astype(jnp.float32)
            x0 = (x - et * jnp.sqrt(1 - at)) / jnp.sqrt(at)
            a = jnp.sqrt(at_next)
            sigma_t = jnp.sqrt(1 - at_next)

            x0_spec = op.to_spec(x0)
            resid = jnp.where(s > 0, x0_spec - y_spec, 0.0)
            lam, cond = ddnm_lambda(s, a, sigma_y, sigma_t, eta)
            x0_hat = x0 - op.from_spec(lam * resid)

            z = jax.random.normal(k1, x.shape)
            z_spec = op.to_spec(z)
            e_spec = op.to_spec(et)
            d1, d2 = ddnm_noise_coeffs(s, cond, a, sigma_y, sigma_t, eta)
            noise = op.from_spec(d1 * z_spec + d2 * e_spec)
            return a * x0_hat + noise, x0

        def travel_step(_):
            z = jax.random.normal(k2, x.shape)
            return (jnp.sqrt(at_next) * x0_prev
                    + z * jnp.sqrt(1 - at_next)), x0_prev

        x_next, x0 = jax.lax.cond(forward, forward_step, travel_step, None)
        return (x_next, x0, key), None

    (x, x0, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x), key),
        (t_arr, at_arr, at_next_arr, fwd_arr))
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
