"""The long-tail SVD operators must match dense linear algebra.

Reference semantics: models/DDNM/functions/svd_operators.py — SRConv
(:851), Deblurring2D (:1094), WalshHadamardCS (:211), GeneralA (:173),
Denoising (:442).  Our SpectralOp keeps only (V, s); everything checkable
about the degradation through DDNM — the range-space projector
V diag(s>0) V^T and the singular values — is basis-independent, so we
verify those against numpy SVDs of densely-built operator matrices.
"""
import numpy as np
import jax.numpy as jnp

from pointdreamer_tpu.models.diffusion import svd_ops as S


def _range_projector(op, x):
    """V diag(s>0) V^T x — equals pinv(A) A x for ANY A with that V/s."""
    z = op.to_spec(x)
    return op.from_spec(jnp.where(op.singulars > 0, z, 0.0))


def test_sr_conv_matches_dense_pinv():
    h = w = 16
    ratio = 2
    xs = np.arange(-2, 3, dtype=np.float64)
    k = np.exp(-xs ** 2 / 2.0)

    op = S.sr_conv_op(k, h, w, ratio)

    # dense 1D strided-conv matrix, same reflective-padding construction
    kn = k / k.sum()
    half = len(kn) // 2
    A1 = np.zeros((h // ratio, h))
    for i in range(ratio // 2, h + ratio // 2, ratio):
        for j in range(i - half, i - half + len(kn)):
            jj = j
            if jj < 0:
                jj = -jj - 1
            if jj >= h:
                jj = (h - 1) - (jj - h)
            A1[i // ratio, jj] += kn[j - i + half]

    # singular values of the 2D operator = outer product of the 1D ones
    s_ours = np.sort(np.asarray(op.singulars).ravel())[::-1]
    s1 = np.linalg.svd(A1, compute_uv=False)
    s_true = np.sort(np.outer(s1, s1).ravel())[::-1]
    nz = s_true > 3e-2
    np.testing.assert_allclose(s_ours[: nz.sum()], s_true[nz], atol=1e-5)

    # range projector equals pinv(A2d) @ A2d per channel
    A2 = np.kron(A1, A1)                       # acts on row-major [h*w]
    P = np.linalg.pinv(A2, rcond=1e-6) @ A2
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    ours = np.asarray(_range_projector(op, jnp.asarray(x)))
    for c in range(3):
        want = (P @ x[0, :, :, c].ravel()).reshape(h, w)
        np.testing.assert_allclose(ours[0, :, :, c], want, atol=1e-3)


def test_deblurring2d_anisotropic():
    h, w = 16, 16
    ky = np.array([0.25, 0.5, 0.25])
    kx = np.array([0.1, 0.2, 0.4, 0.2, 0.1])
    op = S.deblurring2d_op(ky, kx, h, w)

    M1 = S._conv1d_matrix(ky, h)
    M2 = S._conv1d_matrix(kx, w)
    A2 = np.kron(M1, M2)
    s_true = np.sort(np.linalg.svd(A2, compute_uv=False))[::-1]
    s_ours = np.sort(np.asarray(op.singulars).ravel())[::-1]
    keep = s_true > 2e-2
    np.testing.assert_allclose(s_ours[: keep.sum()], s_true[keep],
                               atol=1e-5)

    # orthonormal V: to_spec/from_spec roundtrip is the identity
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(op.from_spec(op.to_spec(x))),
                               np.asarray(x), atol=1e-4)


def test_walsh_hadamard_cs_roundtrip_and_rank():
    h = w = 16                                  # n = 256 (power of two)
    op = S.walsh_hadamard_cs_op(h, w, ratio=4, seed=3)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    # V orthonormal
    np.testing.assert_allclose(np.asarray(op.from_spec(op.to_spec(x))),
                               np.asarray(x), atol=1e-4)
    # energy preserved by V^T
    z = np.asarray(op.to_spec(x))
    np.testing.assert_allclose((z ** 2).sum(), (np.asarray(x) ** 2).sum(),
                               rtol=1e-4)
    # rank = n / ratio kept components
    assert int(np.asarray(op.singulars).sum()) == h * w // 4
    # projector is idempotent
    p1 = _range_projector(op, x)
    p2 = _range_projector(op, p1)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_general_a_matches_dense():
    h = w = 4
    c = 3
    n = h * w * c
    m = 20
    rng = np.random.default_rng(5)
    A = rng.standard_normal((m, n))
    op = S.general_a_op(A, h, w, c)

    s_true = np.linalg.svd(A, compute_uv=False)
    s_ours = np.sort(np.asarray(op.singulars).ravel())[::-1]
    np.testing.assert_allclose(s_ours[:m], s_true, atol=1e-4)

    P = np.linalg.pinv(A) @ A
    x = rng.standard_normal((1, h, w, c)).astype(np.float32)
    ours = np.asarray(_range_projector(op, jnp.asarray(x)))
    want = (P @ x.reshape(-1)).reshape(1, h, w, c)
    np.testing.assert_allclose(ours, want, atol=1e-3)


def test_denoising_identity():
    op = S.denoising_op()
    x = jnp.asarray(np.random.default_rng(7)
                    .standard_normal((1, 8, 8, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(op.A(x)), np.asarray(x))
