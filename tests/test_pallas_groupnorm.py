"""Fused GroupNorm kernel vs flax.linen.GroupNorm (interpret mode)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointdreamer_tpu.kernels.groupnorm_pallas import fused_groupnorm


def _ref(x, gamma, beta, ss=None, silu=True):
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
    y = gn.apply({"params": {"scale": gamma, "bias": beta}},
                 x.astype(jnp.float32))
    if ss is not None:
        C = x.shape[-1]
        y = y * (1.0 + ss[:, None, :C]) + ss[:, None, C:]
    if silu:
        y = nn.silu(y)
    return y


@pytest.mark.parametrize("B,S,C", [(2, 4096, 128), (3, 256, 256),
                                   (1, 8192, 128)])
@pytest.mark.parametrize("silu", [True, False])
def test_fused_groupnorm_matches_flax(B, S, C, silu):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, C), jnp.float32) * 2.0 + 0.3
    gamma = jax.random.normal(jax.random.PRNGKey(1), (C,)) * 0.5 + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.2
    ref = _ref(x, gamma, beta, silu=silu)
    got = fused_groupnorm(x, gamma, beta, silu=silu,
                          out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_groupnorm_scale_shift():
    B, S, C = 2, 1024, 128
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, C), jnp.float32)
    gamma = jnp.ones((C,)) * 1.3
    beta = jnp.zeros((C,)) + 0.1
    ss = jax.random.normal(jax.random.PRNGKey(3), (B, 2 * C)) * 0.3
    ref = _ref(x, gamma, beta, ss=ss, silu=True)
    got = fused_groupnorm(x, gamma, beta, ss, silu=True,
                          out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_groupnorm_bf16_input():
    B, S, C = 2, 2048, 128
    x = (jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
         .astype(jnp.bfloat16))
    gamma = jnp.ones((C,))
    beta = jnp.zeros((C,))
    ref = _ref(x.astype(jnp.float32), gamma, beta, silu=True)
    got = fused_groupnorm(x, gamma, beta, silu=True,
                          out_dtype=jnp.bfloat16, interpret=True)
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(ref)))
    assert err < 0.06, err   # bf16 output quantum on O(1) values
