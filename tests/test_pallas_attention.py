"""Fused attention kernel vs the XLA einsum reference path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _reference(qkv, heads, hd):
    """The module's XLA path (== reference QKVAttentionLegacy math)."""
    B, T, _ = qkv.shape
    qkv4 = qkv.reshape(B, T, heads, 3 * hd).astype(jnp.float32)
    q, k, v = jnp.split(qkv4, 3, axis=-1)
    scale = 1.0 / (hd ** 0.25)
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", w, v)
    return out.reshape(B, T, heads * hd)


@pytest.mark.parametrize("shape", [(2, 64, 4, 64), (1, 256, 8, 64),
                                   (3, 40, 2, 16)])
def test_fused_attention_matches_einsum(shape):
    from pointdreamer_tpu.kernels.attention_pallas import fused_attention_qkv

    rng = np.random.default_rng(0)
    B, T, H, D = shape
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * H * D)), jnp.float32)
    ref = np.asarray(_reference(qkv, H, D))
    got = np.asarray(fused_attention_qkv(qkv, H, D, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_fused_attention_bf16():
    from pointdreamer_tpu.kernels.attention_pallas import fused_attention_qkv

    rng = np.random.default_rng(1)
    B, T, H, D = 2, 128, 4, 64
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * H * D)), jnp.bfloat16)
    ref = np.asarray(_reference(qkv.astype(jnp.float32), H, D))
    got = np.asarray(fused_attention_qkv(qkv, H, D, interpret=True)
                     .astype(jnp.float32))
    np.testing.assert_allclose(got, ref, atol=0.03, rtol=0.03)


def test_gate_requires_tpu():
    from pointdreamer_tpu.kernels.attention_pallas import attention_pallas_ok

    # conftest pins the CPU backend: the production gate must say no here
    assert attention_pallas_ok(1024, 8, 64) is False


def test_fused_attention_vjp_matches_einsum_grad():
    """The custom VJP (needed because a raw pallas_call has no autodiff
    rule — the DDPM trainer differentiates through the UNet) must produce
    the einsum formulation's gradient."""
    from pointdreamer_tpu.kernels.attention_pallas import (
        _attention_einsum_ref, fused_attention_qkv)

    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((2, 16, 3 * 2 * 8)), jnp.float32)

    def loss_kernel(q):
        return jnp.sum(jnp.sin(fused_attention_qkv(q, 2, 8, True)))

    def loss_ref(q):
        return jnp.sum(jnp.sin(_attention_einsum_ref(q, 2, 8)))

    g_kernel = np.asarray(jax.grad(loss_kernel)(qkv))
    g_ref = np.asarray(jax.grad(loss_ref)(qkv))
    np.testing.assert_allclose(g_kernel, g_ref, atol=1e-5, rtol=1e-5)
