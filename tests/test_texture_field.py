"""Tri-plane color field tests."""
import numpy as np
import jax
import jax.numpy as jnp

from pointdreamer_tpu.models.texture_field import fit_and_paint
from pointdreamer_tpu.models.texture_field.triplane import (
    TriplaneColorField, field_forward, fit_color_field)


def test_field_forward_shapes():
    f = TriplaneColorField.init(jax.random.PRNGKey(0))
    out = np.asarray(field_forward(f, jnp.zeros((10, 3))))
    assert out.shape == (10, 3)
    assert (np.abs(out) <= 1.0).all()


def test_fit_learns_position_colors(rng):
    xyz = (rng.random((600, 3)) - 0.5).astype(np.float32)
    rgb = (xyz + 0.5).astype(np.float32)          # color = position
    field, losses = fit_color_field(jax.random.PRNGKey(1),
                                    jnp.asarray(xyz), jnp.asarray(rgb),
                                    iterations=150)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0] * 0.5
    pred = np.asarray(field_forward(field, jnp.asarray(xyz[:50])))
    err = np.abs(pred * 0.5 + 0.5 - rgb[:50]).mean()
    assert err < 0.2


def test_fit_and_paint_fills_unseen(rng):
    xyz = (rng.random((300, 3)) - 0.5).astype(np.float32)
    rgb = np.full((300, 3), 0.5, np.float32)
    R = 16
    atlas = jnp.zeros((R, R, 3))
    painted = jnp.zeros((R, R), bool).at[:8].set(True)
    mask = jnp.ones((R, R), bool)
    gb = jnp.zeros((R, R, 3))
    out = np.asarray(fit_and_paint(atlas, painted, gb, mask,
                                   jnp.asarray(xyz), jnp.asarray(rgb),
                                   iterations=60))
    assert np.isfinite(out).all()
    # painted region untouched, unseen region written
    np.testing.assert_allclose(out[:8], 0.0)
    assert np.abs(out[8:] - 0.5).mean() < 0.4
