"""Atlas optimization: scatter-free transpose must equal autodiff."""
import numpy as np
import jax
import jax.numpy as jnp

from pointdreamer_tpu.pipeline import optimize as popt


def test_transpose_matches_autodiff(rng):
    R = 16
    P = 200
    uv = jnp.asarray(rng.random((1, P, 1, 2)).astype(np.float32))
    idx, w, order, starts, ends = popt._bilinear_tables(uv, R)
    g_pix = jnp.asarray(rng.standard_normal((P, 3)).astype(np.float32))

    got = popt._transpose_to_atlas(g_pix, w, order, starts, ends)

    # reference: autodiff through the gather forward
    def fwd(flat):
        return ((flat[idx] * w[..., None]).sum(axis=1) * g_pix).sum()

    want = jax.grad(fwd)(jnp.zeros((R * R, 3)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_optimize_loop_converges(rng):
    # target = render of a known atlas; optimization should recover it on
    # covered texels
    R = 32
    res = 24
    true_atlas = jnp.asarray(rng.random((R, R, 3)).astype(np.float32))
    uv_map = jnp.asarray(rng.random((2, res, res, 2)).astype(np.float32))
    from pointdreamer_tpu.ops.image import bilinear_sample

    targets = jax.vmap(lambda u: bilinear_sample(true_atlas, u))(uv_map)
    mask = jnp.ones((2, res, res))
    atlas0 = jnp.full((R, R, 3), 0.5)
    atlas, losses = popt._optimize_loop(atlas0, targets, uv_map, mask,
                                        5e-2, 100, R)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0] * 0.35
