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
