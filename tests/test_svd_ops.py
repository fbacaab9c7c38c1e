"""Spectral degradation operators + general DDNM+ sampler tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointdreamer_tpu.models.diffusion import svd_ops as S
from pointdreamer_tpu.models.diffusion import UNetModel, init_unet_params


def _check_orthonormal(op, shape, rng):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    # V^T then V must be the identity
    back = op.from_spec(op.to_spec(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
    # norm preservation
    np.testing.assert_allclose(
        float((op.to_spec(x) ** 2).sum()), float((x ** 2).sum()),
        rtol=1e-4)


def test_inpainting_op(rng):
    mask = jnp.zeros((8, 8)).at[:4].set(1.0)
    op = S.inpainting_op(mask)
    _check_orthonormal(op, (2, 8, 8, 3), rng)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    ax = np.asarray(op.A(x))
    np.testing.assert_allclose(ax[0, :4], np.asarray(x)[0, :4], atol=1e-5)
    np.testing.assert_allclose(ax[0, 4:], 0.0, atol=1e-6)


def test_colorization_op(rng):
    op = S.colorization_op(8, 8)
    _check_orthonormal(op, (2, 8, 8, 3), rng)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    ax = np.asarray(op.A(x))
    gray = np.asarray(x).mean(-1)
    # A = V s V^T: each channel = gray mean scaled by s=1/sqrt(3)
    np.testing.assert_allclose(ax[..., 0], gray / np.sqrt(3), atol=1e-4)
    np.testing.assert_allclose(ax[..., 1], gray / np.sqrt(3), atol=1e-4)


def test_super_resolution_op(rng):
    op = S.super_resolution_op(8, 8, 2)
    _check_orthonormal(op, (2, 8, 8, 3), rng)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    ax = np.asarray(op.A(x))
    # A = V s V^T: each 2x2 block constant = block mean * s (= 1/ratio)
    blocks = np.asarray(x).reshape(1, 4, 2, 4, 2, 3).mean((2, 4)) / 2.0
    np.testing.assert_allclose(ax[0, ::2, ::2], blocks[0], atol=1e-4)
    np.testing.assert_allclose(ax[0, 1::2, 1::2], blocks[0], atol=1e-4)


def test_deblurring_op(rng):
    op = S.deblurring_op(np.array([0.25, 0.5, 0.25]), 8, 8)
    _check_orthonormal(op, (1, 8, 8, 3), rng)
    # A of a constant image stays ~constant (kernel sums to 1; borders
    # truncate)
    x = jnp.ones((1, 8, 8, 3))
    ax = np.asarray(op.A(x))
    np.testing.assert_allclose(ax[0, 2:-2, 2:-2], 1.0, atol=1e-3)


def _tiny_model():
    model = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                      channel_mult=(1, 2), attention_ds=(2,),
                      num_head_channels=16, dtype=jnp.float32)
    return model, init_unet_params(model, image_size=16)


@pytest.mark.parametrize("sigma_y", [0.0, 0.05])
def test_ddnm_plus_runs(sigma_y, rng):
    model, params = _tiny_model()
    mask = jnp.zeros((16, 16)).at[:, :8].set(1.0)
    x = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32)) * 2 - 1

    def op_factory(m=mask):
        return S.inpainting_op(m)

    y = op_factory().A(x)
    out = S.ddnm_plus_sample(model, params, y, op_factory,
                             jax.random.PRNGKey(0), sigma_y=sigma_y,
                             t_sampling=8)
    out = np.asarray(out)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(out).all()
    if sigma_y == 0.0:
        # zero-eps-model + DDNM: known pixels driven to the observation
        known = out[:, :, :8]
        np.testing.assert_allclose(
            known, np.clip((np.asarray(x)[:, :, :8] + 1) / 2, 0, 1),
            atol=0.1)


def test_compressed_sensing_op(rng):
    op = S.compressed_sensing_op(32, 32, ratio=0.25)
    _check_orthonormal(op, (1, 32, 32, 3), rng)
    # A keeps exactly 25% of spectral energy dims
    s = np.asarray(op.singulars).ravel()
    assert s.sum() == 256 and set(np.unique(s)) == {0.0, 1.0}


def _ref_lambda_noise_coeffs(s, a, sigma_y, sigma_t, eta):
    """Literal numpy transcription of the reference's Lambda / Lambda_noise
    per-component branch logic (svd_operators.py Inpainting.Lambda:361-389
    and Lambda_noise:391-439; plain-DDNM base case svd_ddnm.py:63-65)."""
    s = np.asarray(s, np.float64)
    lam = np.ones_like(s)
    d1 = np.full_like(s, sigma_t * eta)
    d2 = np.full_like(s, sigma_t * np.sqrt(1 - eta ** 2))
    inv_s = np.where(s > 0, 1.0 / np.where(s > 0, s, 1.0), 0.0)
    if a != 0 and sigma_y != 0:
        change = (sigma_t < a * sigma_y * inv_s)
        lam = np.where(change,
                       s * sigma_t * np.sqrt(1 - eta ** 2) / a / sigma_y,
                       lam)
        d1 = np.where(change, sigma_t * eta, d1)
        d2 = np.where(change, 0.0, d2)
        change = (sigma_t > a * sigma_y * inv_s)
        d1 = np.where(change,
                      np.sqrt(np.maximum(
                          sigma_t ** 2 - a ** 2 * sigma_y ** 2 * inv_s ** 2,
                          0.0)), d1)
        d2 = np.where(change, 0.0, d2)
        change = s == 0
        d1 = np.where(change, sigma_t * eta, d1)
        d2 = np.where(change, sigma_t * np.sqrt(1 - eta ** 2), d2)
    return lam, d1, d2


@pytest.mark.parametrize("sigma_y", [0.0, 0.02, 0.3])
@pytest.mark.parametrize("sigma_t", [0.05, 0.5, 0.99])
def test_lambda_noise_coeffs_match_reference(sigma_y, sigma_t):
    """ddnm_lambda / ddnm_noise_coeffs match the reference's per-component
    branch logic on a spectrum with observed (various s) and null dims."""
    s = jnp.asarray([0.0, 0.1, 0.5, 1.0 / np.sqrt(3), 1.0], jnp.float32)
    a, eta = 0.9, 0.85
    lam, cond = S.ddnm_lambda(s, a, sigma_y, sigma_t, eta)
    d1, d2 = S.ddnm_noise_coeffs(s, cond, a, sigma_y, sigma_t, eta)
    ref_lam, ref_d1, ref_d2 = _ref_lambda_noise_coeffs(
        np.asarray(s), a, sigma_y, sigma_t, eta)
    # our lam is applied to a residual that is zero on s==0 components, so
    # lam there is irrelevant — compare only observed components
    obs = np.asarray(s) > 0
    np.testing.assert_allclose(np.asarray(lam)[obs], ref_lam[obs],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), ref_d1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-5, atol=1e-6)
