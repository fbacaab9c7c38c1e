"""Winograd F(2x2,3x3) kernel: exactness vs the direct convolution.

The kernel itself is an EXPERIMENT kept for the record: on v5e it is
correct but ~2.4x slower than XLA's direct conv (11.7 vs 4.9 ms on the
UNet's dominant [8,256,256,256]->256 shape) — the VPU-side B^T d B /
A^T m A transform adds and the even/odd tile views cost more than the
2.25x MXU multiply reduction saves.  It is NOT wired into the UNet
(see ROADMAP.md "refuted"); these tests pin the math so the measurement
stays reproducible.
"""
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from pointdreamer_tpu.kernels.winograd_pallas import (transform_weights,
                                                      winograd_conv3x3)


def _direct(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)


@pytest.mark.parametrize("shape,cout", [((2, 16, 16, 128), 128),
                                        ((1, 8, 32, 256), 128)])
def test_winograd_matches_direct_conv(shape, cout):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32) * 0.5
    w = jax.random.normal(jax.random.PRNGKey(1),
                          (3, 3, shape[-1], cout), jnp.float32) * 0.05
    ref = _direct(x, w)
    got = winograd_conv3x3(x, w, interpret=True).astype(jnp.float32)
    # U is stored bf16 -> ~0.5% relative error budget
    rel = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.02, rel


def test_weight_transform_shape_and_identity():
    w = jnp.zeros((3, 3, 4, 8)).at[1, 1, :, :].set(1.0)  # identity 3x3
    u = transform_weights(w)
    assert u.shape == (16, 4, 8)
    # G g G^T of the center-tap kernel: closed form outer(Gc, Gc) with
    # Gc = G[:, 1] = [0, .5, -.5, 0]
    import numpy as np
    expect = np.outer([0, 0.5, -0.5, 0], [0, 0.5, -0.5, 0]).reshape(16)
    np.testing.assert_allclose(np.asarray(u[:, 0, 0]), expect, atol=1e-2)
