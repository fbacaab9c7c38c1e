"""Tests for the flax guided-diffusion UNet + DDNM sampler."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointdreamer_tpu.models.diffusion import (
    DDNMInpainter,
    UNetModel,
    init_unet_params,
)
from pointdreamer_tpu.models.diffusion.ddnm import (
    compute_alpha,
    ddnm_inpaint_batch,
    get_schedule_jump,
    make_betas,
)
from pointdreamer_tpu.models.diffusion.convert import convert_torch_state_dict
from pointdreamer_tpu.models.diffusion.unet import timestep_embedding, unet_plan


def tiny_unet(**kw):
    return UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                     channel_mult=(1, 2), attention_ds=(2,),
                     num_head_channels=16, dtype=jnp.float32, **kw)


def test_unet_shapes_and_grad_path():
    model = tiny_unet()
    params = init_unet_params(model, image_size=16)
    x = jnp.ones((2, 16, 16, 3))
    t = jnp.asarray([0.0, 500.0])
    out = model.apply({"params": params}, x, t)
    assert out.shape == (2, 16, 16, 6)
    assert np.isfinite(np.asarray(out)).all()
    # zero-init output conv -> exact zeros at init (reference zero_module)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_timestep_embedding_matches_reference_formula():
    emb = np.asarray(timestep_embedding(jnp.asarray([0.0, 10.0]), 8))
    assert emb.shape == (2, 8)
    np.testing.assert_allclose(emb[0, :4], 1.0, atol=1e-6)  # cos(0)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-6)  # sin(0)
    half = 4
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    np.testing.assert_allclose(emb[1, :4], np.cos(10 * freqs), atol=1e-5)


def test_schedule_jump_plain_ddim():
    ts = get_schedule_jump(100, 1, 1)
    assert ts == list(range(99, -1, -1)) + [-1]
    betas = make_betas()
    a = compute_alpha(betas, np.array([-1, 0, 999]))
    assert a[0] == 1.0
    assert 0.999 < a[1] < 1.0
    assert a[2] < 1e-4


def test_ddnm_inpaint_runs_and_respects_known_pixels():
    # with a zero-eps model, x0 estimate = x_t/sqrt(at); the data-consistency
    # projection should still drive known pixels to y at the end
    model = tiny_unet()
    params = init_unet_params(model, image_size=16)
    img = jnp.ones((2, 16, 16, 3)) * 0.75
    mask = jnp.zeros((2, 16, 16))
    mask = mask.at[:, :8].set(1.0)
    out = ddnm_inpaint_batch(model, params, img * mask[..., None], mask,
                             jax.random.PRNGKey(0), t_sampling=10)
    out = np.asarray(out)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(out).all()
    # known region close to the observation (zero-eps UNet -> DDIM noise
    # terms vanish as at_next -> 1)
    np.testing.assert_allclose(out[:, :8].mean(), 0.75, atol=0.05)


def test_converter_bijection_with_flax_tree():
    """Build a fake torch state dict from flax-init params via the inverse
    mapping; convert; the result must equal the original tree exactly."""
    model = tiny_unet()
    params = init_unet_params(model, image_size=16)
    plan_i, plan_m, plan_o = unet_plan(32, 1, (1, 2), (2,))

    sd = {}

    def put_conv(tp, p):
        sd[tp + ".weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        sd[tp + ".bias"] = np.asarray(p["bias"])

    def put_dense(tp, p):
        sd[tp + ".weight"] = np.asarray(p["kernel"]).T
        sd[tp + ".bias"] = np.asarray(p["bias"])

    def put_conv1d(tp, p):
        sd[tp + ".weight"] = np.asarray(p["kernel"]).T[..., None]
        sd[tp + ".bias"] = np.asarray(p["bias"])

    def put_norm(tp, p):
        sd[tp + ".weight"] = np.asarray(p["scale"])
        sd[tp + ".bias"] = np.asarray(p["bias"])

    def put(kind, tp, p):
        if kind == "conv":
            put_conv(tp, p)
        elif kind == "res":
            put_norm(tp + ".in_layers.0", p["in_norm"])
            put_conv(tp + ".in_layers.2", p["in_conv"])
            put_dense(tp + ".emb_layers.1", p["emb"])
            put_norm(tp + ".out_layers.0", p["out_norm"])
            put_conv(tp + ".out_layers.3", p["out_conv"])
            if "skip" in p:
                put_conv(tp + ".skip_connection", p["skip"])
        elif kind == "attn":
            put_norm(tp + ".norm", p["norm"])
            put_conv1d(tp + ".qkv", p["qkv"])
            put_conv1d(tp + ".proj_out", p["proj"])
        elif kind == "down":
            put_conv(tp + ".op", p["conv"])
        elif kind == "up":
            put_conv(tp + ".conv", p["conv"])

    put_dense("time_embed.0", params["time_embed_0"])
    put_dense("time_embed.2", params["time_embed_2"])
    put_norm("out.0", params["out_norm"])
    put_conv("out.2", params["out_conv"])
    for i, layers in enumerate(plan_i):
        for j, (kind, _, _) in enumerate(layers):
            put(kind, f"input_blocks.{i}.{j}", params[f"input_{i}_{j}"])
    for j, (kind, _, _) in enumerate(plan_m):
        put(kind, f"middle_block.{j}", params[f"middle_{j}"])
    for i, layers in enumerate(plan_o):
        for j, (kind, _, _) in enumerate(layers):
            put(kind, f"output_blocks.{i}.{j}", params[f"output_{i}_{j}"])

    conv = convert_torch_state_dict(sd, model_channels=32, num_res_blocks=1,
                                    channel_mult=(1, 2), attention_ds=(2,))
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(conv)[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   atol=1e-6, err_msg=str(ka))
    # converted tree must be apply()-compatible
    out = model.apply({"params": conv}, jnp.ones((1, 16, 16, 3)),
                      jnp.zeros((1,)))
    assert out.shape == (1, 16, 16, 6)


def test_full_imagenet256_plan_matches_torch_block_count():
    # torch model has 22 input blocks (1 + 6*2 + 5 downs), 3 middle,
    # 18 output blocks for channel_mult (1,1,2,2,4,4), num_res_blocks 2
    pi, pm, po = unet_plan()
    assert len(pi) == 1 + 6 * 2 + 5
    assert len(pm) == 3
    assert len(po) == 18


def test_ddnm_matches_independent_reference_loop():
    """Replicate simplified_ddnm_inpainting (diffusion.py:459-570) in
    plain numpy (same equations, same RNG stream) and require our scanned
    sampler to match the trajectory exactly."""
    import jax

    model = tiny_unet()
    params = init_unet_params(model, image_size=16)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, 16, 16)) < 0.5).astype(np.float32))
    key = jax.random.PRNGKey(42)
    t_sampling = 6

    ours = np.asarray(ddnm_inpaint_batch(model, params,
                                         img * mask[..., None], mask,
                                         key, t_sampling=t_sampling))

    # ---- independent reference loop ----
    def eps(x, t):
        return np.asarray(model.apply(
            {"params": params}, jnp.asarray(x),
            jnp.full((x.shape[0],), t)))[..., :3]

    masks = np.asarray(mask)[..., None]
    y = (np.asarray(img) * 2.0 - 1.0) * masks
    betas = make_betas()
    skip = 1000 // t_sampling
    times = get_schedule_jump(t_sampling, 1, 1)
    k, sub = jax.random.split(key)
    x = np.asarray(jax.random.normal(sub, (2, 16, 16, 3), jnp.float32))
    eta = 0.85
    for i, j in zip(times[:-1], times[1:]):
        ii, jj = i * skip, (-1 if j < 0 else j * skip)
        at = compute_alpha(betas, np.array([ii]))[0]
        at_next = compute_alpha(betas, np.array([jj]))[0]
        k, sub = jax.random.split(k)
        et = eps(x, float(ii))
        x0 = (x - et * np.sqrt(1 - at)) / np.sqrt(at)
        sigma_t = np.sqrt(1 - at_next ** 2)         # reference's square
        x0_hat = x0 - (x0 * masks - y)              # Eq.17, sigma_y=0
        c1 = np.sqrt(1 - at_next) * eta
        c2 = np.sqrt(1 - at_next) * np.sqrt(1 - eta ** 2)
        z = np.asarray(jax.random.normal(sub, x.shape, jnp.float32))
        x = np.sqrt(at_next) * x0_hat + sigma_t * (c1 * z + c2 * et)
    want = np.clip((x + 1) / 2, 0, 1)
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_w8a8_quant_tree_structure_matches_init():
    """quantize_unet_params output must be jit-compatible with the
    quant=True model: identical tree paths, shapes, and dtypes."""
    from pointdreamer_tpu.models.diffusion.unet import quantize_unet_params

    fp = tiny_unet()
    params = init_unet_params(fp, image_size=16)
    qparams = quantize_unet_params(params)
    qmodel = tiny_unet(quant=True)
    ref = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                            jnp.zeros((1,))))["params"]
    got = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), qparams)
    want = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), ref)
    assert got == want


def test_w8a8_ddnm_sampler_fidelity_gate():
    """End-to-end DDNM fidelity gate for w8a8 (the bar that keeps
    `ddnm_quant_int8` shippable): run the full scanned sampler with the
    fp model and with its quantized torso on the same inputs and noise
    stream, and require the results to agree.  The known region must be
    pinned EXACTLY by the Eq.17 data-consistency projection regardless of
    eps-model error; the inpainted region accumulates 25 steps of int8
    forward error and must stay within a measured-with-margin band
    (measured: 34.3 dB / corr 0.9989 on this configuration)."""
    from pointdreamer_tpu.models.diffusion.ddnm import ddnm_inpaint_batch
    from pointdreamer_tpu.models.diffusion.unet import quantize_unet_params

    fp = tiny_unet()
    params = fp.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)),
                     jnp.zeros((1,)))["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.sign(
            jnp.sin(jnp.arange(p.size, dtype=jnp.float32)).reshape(p.shape)
            + 0.1) if p.ndim >= 2 else p, params)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    mask = jnp.asarray((rng.random((2, 16, 16)) < 0.5), jnp.float32)
    key = jax.random.PRNGKey(1234)
    out_fp = np.asarray(ddnm_inpaint_batch(fp, params, img, mask, key,
                                           t_sampling=25))
    q = tiny_unet(quant=True)
    out_q = np.asarray(ddnm_inpaint_batch(q, quantize_unet_params(params),
                                          img, mask, key, t_sampling=25))

    def psnr(a, b):
        return 10 * np.log10(1.0 / max(float(np.mean((a - b) ** 2)), 1e-12))

    known = np.broadcast_to(np.asarray(mask)[..., None].astype(bool),
                            out_fp.shape)
    assert psnr(out_q[known], out_fp[known]) >= 60.0
    assert psnr(out_q, out_fp) >= 28.0
    assert np.corrcoef(out_q.ravel(), out_fp.ravel())[0, 1] >= 0.99


def test_w8a8_static_scales_exact_when_calibrated_on_same_input():
    """Wiring check: with margin=1.0 and calibration on the exact same
    input, the static activation scale equals the dynamic abs-max, so
    the static-scale forward must be BIT-IDENTICAL to the dynamic one."""
    from pointdreamer_tpu.models.diffusion.unet import (
        calibrate_act_scales, quantize_unet_params)

    fp = tiny_unet()
    params = fp.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)),
                     jnp.zeros((1,)))["params"]
    qparams = quantize_unet_params(params)
    q = tiny_unet(quant=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 2 - 1
    t = jnp.asarray([10.0, 700.0])
    dyn = np.asarray(q.apply({"params": qparams}, x, t))
    scales = calibrate_act_scales(q, qparams, [x], [t], margin=1.0)
    # every quantized site contributed a scale
    n_leaves = len(jax.tree_util.tree_leaves(scales))
    assert n_leaves > 5
    stat = np.asarray(q.apply({"params": qparams, "act_scales": scales},
                              x, t))
    np.testing.assert_array_equal(stat, dyn)


def test_w8a8_static_scales_fidelity():
    """End-to-end gate for the static-activation-scale w8a8 path (the
    default when ddnm_quant_int8 is on): DDNMInpainter(static_calib=True)
    calibrates on its first call and the sampled result must track the
    fp sampler as tightly as the dynamic-scale gate above, and stay
    close to the dynamic-scale quantized result."""
    from pointdreamer_tpu.models.diffusion.unet import quantize_unet_params

    fp = tiny_unet()
    params = fp.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)),
                     jnp.zeros((1,)))["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.sign(
            jnp.sin(jnp.arange(p.size, dtype=jnp.float32)).reshape(p.shape)
            + 0.1) if p.ndim >= 2 else p, params)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    mask = jnp.asarray((rng.random((2, 16, 16)) < 0.5), jnp.float32)
    key = jax.random.PRNGKey(1234)
    out_fp = np.asarray(ddnm_inpaint_batch(fp, params, img, mask, key,
                                           t_sampling=25))
    q = tiny_unet(quant=True)
    qparams = quantize_unet_params(params)
    out_dyn = np.asarray(ddnm_inpaint_batch(q, qparams, img, mask, key,
                                            t_sampling=25))
    inp = DDNMInpainter(q, qparams, t_sampling=25, static_calib=True)
    out_stat = np.asarray(inp.inpaint(img, mask, key))
    assert inp._act_scales is not None   # calibration actually ran

    def psnr(a, b):
        return 10 * np.log10(1.0 / max(float(np.mean((a - b) ** 2)), 1e-12))

    known = np.broadcast_to(np.asarray(mask)[..., None].astype(bool),
                            out_fp.shape)
    assert psnr(out_stat[known], out_fp[known]) >= 60.0
    assert psnr(out_stat, out_fp) >= 28.0
    assert np.corrcoef(out_stat.ravel(), out_fp.ravel())[0, 1] >= 0.99
    # static vs dynamic quantization agree closely on the full image
    assert psnr(out_stat, out_dyn) >= 30.0
    # the second call reuses the cached scales (no recalibration)
    cached = inp._act_scales
    _ = inp.inpaint(img, mask, key)
    assert inp._act_scales is cached
    # production pattern: calibrate on the FIRST shape, reuse on all later
    # ones — a second, different image/mask/key must clear the same gates
    # on the reused scales (the calib margin absorbs content drift;
    # out-of-range activations saturate at +-127)
    rng2 = np.random.default_rng(11)
    img2 = jnp.asarray(rng2.random((2, 16, 16, 3)), jnp.float32)
    mask2 = jnp.asarray((rng2.random((2, 16, 16)) < 0.4), jnp.float32)
    key2 = jax.random.PRNGKey(99)
    out_fp2 = np.asarray(ddnm_inpaint_batch(fp, params, img2, mask2, key2,
                                            t_sampling=25))
    out_dyn2 = np.asarray(ddnm_inpaint_batch(q, qparams, img2, mask2, key2,
                                             t_sampling=25))
    out_stat2 = np.asarray(inp.inpaint(img2, mask2, key2))
    assert inp._act_scales is cached          # still no recalibration
    known2 = np.broadcast_to(np.asarray(mask2)[..., None].astype(bool),
                             out_fp2.shape)
    assert psnr(out_stat2[known2], out_fp2[known2]) >= 60.0
    assert psnr(out_stat2, out_fp2) >= 28.0
    assert np.corrcoef(out_stat2.ravel(), out_fp2.ravel())[0, 1] >= 0.99
    assert psnr(out_stat2, out_dyn2) >= 30.0


def test_static_calib_degrades_on_unquantized_model():
    """DDNMInpainter(static_calib=True) over a model with NO quantized
    layers must degrade to the plain fp path (flax omits empty collections
    from the mutable return; the empty-calib fallback must execute rather
    than KeyError at trace time)."""
    fp = tiny_unet()
    params = fp.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)),
                     jnp.zeros((1,)))["params"]
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    mask = jnp.asarray((rng.random((1, 16, 16)) < 0.5), jnp.float32)
    key = jax.random.PRNGKey(0)
    inp = DDNMInpainter(fp, params, t_sampling=5, static_calib=True)
    out = np.asarray(inp.inpaint(img, mask, key))
    assert inp.static_calib is False and inp._act_scales is None
    ref = np.asarray(ddnm_inpaint_batch(fp, params, img, mask, key,
                                        t_sampling=5))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_w8a8_quant_output_close_to_fp():
    """w8a8 forward tracks the fp forward on a non-degenerate model: the
    params are randomly initialized (fan-in scaled), so per-channel int8
    weight quantization plus per-tensor activation quantization should
    agree to a few percent relative error."""
    from pointdreamer_tpu.models.diffusion.unet import quantize_unet_params

    fp = tiny_unet()
    # random params at a realistic scale (flax default lecun_normal init)
    params = fp.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)),
                     jnp.zeros((1,)))["params"]
    # zero-init out layers make the output trivially zero; perturb them
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.sign(jnp.sin(jnp.arange(p.size, dtype=jnp.float32)).reshape(p.shape) + 0.1)
        if p.ndim >= 2 else p, params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 2 - 1
    t = jnp.asarray([10.0, 700.0])
    ref = np.asarray(fp.apply({"params": params}, x, t))
    q = tiny_unet(quant=True)
    out = np.asarray(q.apply({"params": quantize_unet_params(params)}, x, t))
    assert np.isfinite(out).all()
    denom = np.abs(ref).mean() + 1e-6
    rel = np.abs(out - ref).mean() / denom
    assert rel < 0.15, rel
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98, corr


def test_synthetic_images_family():
    from pointdreamer_tpu.models.diffusion.synthetic_images import (
        sample_images)

    k = jax.random.PRNGKey(3)
    imgs = np.asarray(sample_images(k, 4, 16))
    assert imgs.shape == (4, 16, 16, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # distinct images, deterministic in the key
    assert np.abs(imgs[0] - imgs[1]).max() > 0.05
    again = np.asarray(sample_images(k, 4, 16))
    np.testing.assert_array_equal(imgs, again)


def test_ddpm_trainer_learns():
    """Two scanned epochs on the tiny UNet must reduce the eps-matching
    loss (device-side data generation end to end)."""
    from pointdreamer_tpu.models.diffusion.train import fit_ddpm

    model = UNetModel(model_channels=32, out_channels=3, num_res_blocks=1,
                      channel_mult=(1, 2), attention_ds=(2,),
                      num_head_channels=16, dtype=jnp.float32)
    params = init_unet_params(model, image_size=16)
    _, hist = fit_ddpm(model, params, epochs=2, steps_per_epoch=8,
                       batch=4, res=16, lr=1e-3)
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert np.isfinite(hist[-1]["loss"])
