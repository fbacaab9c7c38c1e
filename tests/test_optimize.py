"""Atlas optimization: scatter-free transpose must equal autodiff."""
import numpy as np
import jax
import jax.numpy as jnp

from pointdreamer_tpu.pipeline import optimize as popt


def test_transpose_matches_autodiff(rng):
    R = 16
    P = 200
    uv = jnp.asarray(rng.random((1, P, 1, 2)).astype(np.float32))
    base, w4, order, cum_bounds = popt._sorted_pixel_tables(
        uv.reshape(-1, 2), R)
    g_pix = jnp.asarray(rng.standard_normal((P, 3)).astype(np.float32))
    g_sorted = g_pix[order]

    got = popt._grad_to_atlas(g_sorted, w4, cum_bounds, R)

    # reference: autodiff through the fused-corner gather forward
    def fwd(flat):
        crn = popt._corner_rows(flat, R)[base]
        rendered = (crn.reshape(-1, 4, 3) * w4[..., None]).sum(axis=1)
        return (rendered * g_sorted).sum()

    want = jax.grad(fwd)(jnp.zeros((R * R, 3)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_fused_forward_matches_clamped_bilinear(rng):
    # the roll-wrap at x0==R-1 / y0==R-1 must be exactly cancelled by the
    # zero weights there, including for uvs that land outside [0,1]
    R = 8
    uv = jnp.asarray(rng.uniform(-0.2, 1.2, (500, 2)).astype(np.float32))
    atlas = jnp.asarray(rng.random((R * R, 3)).astype(np.float32))
    base, w4 = popt._bilinear_base_tables(uv, R)
    crn = popt._corner_rows(atlas, R)[base]
    got = (crn.reshape(-1, 4, 3) * w4[..., None]).sum(axis=1)

    from pointdreamer_tpu.ops.image import bilinear_sample
    want = bilinear_sample(atlas.reshape(R, R, 3), uv[None, :, :])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_loop_matches_autodiff_reference(rng):
    # the production scatter-free loop must match a plain
    # jax.value_and_grad Adam loop on every texel, including untouched
    # ones
    R = 16
    K = 300
    uv = jnp.asarray(rng.uniform(-0.1, 1.1, (K, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.random((K, 3)).astype(np.float32))
    msk = jnp.asarray((rng.random((K, 1)) > 0.3).astype(np.float32))
    atlas0 = jnp.asarray(rng.random((R * R, 3)).astype(np.float32))
    denom = float(K * 3)

    base, w4, order, cum_bounds = popt._sorted_pixel_tables(uv, R)
    tgt_s = tgt[order]
    msk_s = msk[order]

    want, want_losses = popt._optimize_loop_autodiff_reference(
        atlas0, tgt_s, msk_s, base, w4, denom, 5e-2, 40, R)
    got, got_losses = popt._optimize_loop_fused(
        atlas0, tgt_s, msk_s, base, w4, cum_bounds, denom, 5e-2, 40, R)

    np.testing.assert_allclose(np.asarray(got_losses),
                               np.asarray(want_losses), atol=1e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_segsum_pallas_matches_dense(rng):
    # the Mosaic interval one-hot segment-sum (interpret mode on CPU)
    # must reproduce np.add.at over sorted bases, pads and all
    from pointdreamer_tpu.kernels.segsum_pallas import (
        BASE_SENTINEL, segment_sum_expand)

    n_tex, B, W2 = 1024, 128, 256
    K = 700
    base = np.sort(rng.integers(0, n_tex, K)).astype(np.int32)
    contrib = rng.standard_normal((12, K)).astype(np.float32)

    counts = np.bincount(base, minlength=n_tex)
    cb = np.cumsum(counts)
    starts = np.concatenate([[0], cb[B - 1::B][:-1]])
    assert (cb[B - 1::B] - starts).max() <= W2 - 128
    Kpad = -(-K // 128) * 128 + W2
    off128 = jnp.asarray((starts // 128).astype(np.int32))
    base_row = np.full((1, Kpad), BASE_SENTINEL, np.int32)
    base_row[0, :K] = base
    contribT = np.zeros((12, Kpad), np.float32)
    contribT[:, :K] = contrib

    got = np.asarray(segment_sum_expand(
        jnp.asarray(contribT), jnp.asarray(base_row), off128,
        n_tex, B, W2, interpret=True))
    want = np.zeros((n_tex, 12), np.float32)
    np.add.at(want, base, contrib.T)
    np.testing.assert_allclose(got, want.T, atol=1e-5, rtol=1e-5)


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
