"""Numerical parity against the ACTUAL reference torch modules.

torch (cpu) is installed and the reference tree is mounted read-only, so
we can instantiate the reference networks with random weights, convert
their state_dicts with our converters, and require our JAX forwards to
match to float tolerance.  This is the checkpoint-fidelity proof without
the (undistributed) pretrained checkpoints: when a user supplies
`256x256_diffusion_uncond.pt` / `checkpoint.pth`, the same converter path
is exercised.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _stub_torch_geometric():
    """The POCO modules import torch_geometric only for the (unused at
    forward time) Data class; stub it so the reference code imports."""
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tg_data = types.ModuleType("torch_geometric.data")
        tg_data.Data = object
        tg_nn = types.ModuleType("torch_geometric.nn")
        tg_nn.voxel_grid = lambda *a, **k: None
        tg_pool = types.ModuleType("torch_geometric.nn.pool")
        tg_consec = types.ModuleType(
            "torch_geometric.nn.pool.consecutive")
        tg_consec.consecutive_cluster = lambda *a, **k: None
        tg_tr = types.ModuleType("torch_geometric.transforms")
        tg_tr.RandomRotate = object
        tg.data = tg_data
        tg.nn = tg_nn
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.data"] = tg_data
        sys.modules["torch_geometric.nn"] = tg_nn
        sys.modules["torch_geometric.nn.pool"] = tg_pool
        sys.modules["torch_geometric.nn.pool.consecutive"] = tg_consec
        sys.modules["torch_geometric.transforms"] = tg_tr


# --------------------------------------------------------------------------
# guided-diffusion UNet
# --------------------------------------------------------------------------

def test_unet_forward_matches_reference_torch():
    sys.path.insert(0, REF + "/models/DDNM")
    from guided_diffusion.unet import UNetModel as TorchUNet

    import jax
    import jax.numpy as jnp

    from pointdreamer_tpu.models.diffusion import UNetModel
    from pointdreamer_tpu.models.diffusion.convert import (
        convert_torch_state_dict)

    torch.manual_seed(0)
    tm = TorchUNet(image_size=16, in_channels=3, model_channels=32,
                   out_channels=6, num_res_blocks=1,
                   attention_resolutions=(2,), channel_mult=(1, 2),
                   num_heads=1, num_head_channels=16,
                   use_scale_shift_norm=True, resblock_updown=True,
                   use_fp16=False).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_torch_state_dict(sd, model_channels=32,
                                      num_res_blocks=1, channel_mult=(1, 2),
                                      attention_ds=(2,))
    ours = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                     channel_mult=(1, 2), attention_ds=(2,),
                     num_head_channels=16, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([3.0, 777.0], np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                  torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


# --------------------------------------------------------------------------
# POCO FKAConv convolution + attention decoder
# --------------------------------------------------------------------------

def test_fkaconv_matches_reference_torch():
    _stub_torch_geometric()
    sys.path.insert(0, REF + "/models/POCO")
    from lightconvpoint.nn.conv_fkaconv import Convolution_FKAConv

    import jax
    import jax.numpy as jnp

    from pointdreamer_tpu.models.occupancy.convert import _fkaconv
    from pointdreamer_tpu.models.occupancy.fkaconv import fkaconv

    torch.manual_seed(0)
    tc = Convolution_FKAConv(8, 16, 16).eval()
    # give the norm buffers non-trivial values
    with torch.no_grad():
        tc.alpha.fill_(1.3)
        tc.beta.fill_(0.7)
        tc.norm_radius.fill_(0.8)
    sd = {"c." + k: v.detach().numpy() for k, v in tc.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, _fkaconv(sd, "c"))

    rng = np.random.default_rng(2)
    N, M, k = 60, 25, 16
    pos = rng.standard_normal((N, 3)).astype(np.float32)
    x = rng.standard_normal((N, 8)).astype(np.float32)
    support = pos[:M]
    ids = rng.integers(0, N, (M, k))

    # torch layout: [B, C, N], neighbors [B, M, k]
    with torch.no_grad():
        want = tc(torch.from_numpy(x.T[None]),
                  torch.from_numpy(pos.T[None]),
                  torch.from_numpy(support.T[None]),
                  torch.from_numpy(ids[None]))
    want = want[0].numpy().T                      # [M, 16]
    got = np.asarray(fkaconv(params, jnp.asarray(x), jnp.asarray(pos),
                             jnp.asarray(support), jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_decoder_matches_reference_torch():
    _stub_torch_geometric()
    sys.path.insert(0, REF + "/models/POCO")
    from networks.decoder.interp_attention_Kheads import (
        InterpAttentionKHeadsNet)

    import jax
    import jax.numpy as jnp

    from pointdreamer_tpu.models.occupancy.convert import _lin
    from pointdreamer_tpu.models.occupancy.fkaconv import decoder_forward

    torch.manual_seed(0)
    td = InterpAttentionKHeadsNet(32, 2, K=16).eval()
    sd = {"d." + k: v.detach().numpy() for k, v in td.state_dict().items()}
    params = {k: _lin(sd, f"d.{k}")
              for k in ("fc1", "fc2", "fc3", "fc8", "fc_query", "fc_value")}
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(3)
    N, Q, k = 50, 12, 16
    pos = rng.standard_normal((N, 3)).astype(np.float32)
    latents = rng.standard_normal((N, 32)).astype(np.float32)
    queries = rng.standard_normal((Q, 3)).astype(np.float32)
    ids = rng.integers(0, N, (Q, k))

    data = {
        "latents": torch.from_numpy(latents.T[None]),
        "proj_indices": torch.from_numpy(ids[None]),
        "pos": torch.from_numpy(pos.T[None]),
        "pos_non_manifold": torch.from_numpy(queries.T[None]),
    }
    with torch.no_grad():
        want = td(data, spectral_only=True)[0].numpy().T   # [Q, 2]
    got = np.asarray(decoder_forward(params, jnp.asarray(latents),
                                     jnp.asarray(pos), jnp.asarray(queries),
                                     jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_full_backbone_matches_reference_torch():
    """End-to-end FKAConvNetwork (segmentation U-Net) parity: same spatial
    graph (our FPS+kNN), converted weights, eval-mode batchnorm."""
    _stub_torch_geometric()
    sys.path.insert(0, REF + "/models/POCO")
    from networks.backbone.fkaconv_network import FKAConvNetwork

    import jax
    import jax.numpy as jnp

    from pointdreamer_tpu.models.occupancy.convert import (
        convert_torch_state_dict)
    from pointdreamer_tpu.models.occupancy.fkaconv import backbone_forward
    from pointdreamer_tpu.models.occupancy.spatial import compute_spatial

    torch.manual_seed(0)
    tn = FKAConvNetwork(3, 32, segmentation=True, dropout=0).eval()
    # randomize batchnorm running stats so eval-mode parity is meaningful
    with torch.no_grad():
        for m in tn.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    sd = {"net." + k: v.detach().numpy() for k, v in tn.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(sd)["net"])

    rng = np.random.default_rng(4)
    pos = rng.standard_normal((200, 3)).astype(np.float32)
    sp = compute_spatial(jnp.asarray(pos))

    data = {"x": torch.from_numpy(np.ones((1, 3, 200), np.float32)),
            "pos": torch.from_numpy(pos.T[None])}
    for lvl in range(1, 5):
        s = np.asarray(sp[f"support{lvl}"])
        data[f"support{lvl}"] = torch.from_numpy(s.T[None])
    for key in ("ids00", "ids01", "ids11", "ids12", "ids22", "ids23",
                "ids33", "ids34", "ids44", "ids43", "ids32", "ids21",
                "ids10"):
        data[key] = torch.from_numpy(np.asarray(sp[key])[None])

    with torch.no_grad():
        want = tn(data, spectral_only=True)[0].numpy().T   # [N, 32]
    got = np.asarray(backbone_forward(
        params, jnp.ones((200, 3)), sp, train=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


ALT_DECODER_CASES = [
    ("InterpAttentionNet", "networks.decoder.interp_attention"),
    ("InterpMeanNet", "networks.decoder.interp_mean"),
    ("InterpMaxNet", "networks.decoder.interp_max"),
    ("InterpInvDistNet", "networks.decoder.interp_inv_dist"),
    ("InterpMeanPrefixNet", "networks.decoder.interp_mean_prefix"),
    ("InterpInvDistPrefixNet", "networks.decoder.interp_inv_dist_prefix"),
]


@pytest.mark.parametrize("name,module", ALT_DECODER_CASES)
def test_alt_decoders_match_reference_torch(name, module):
    """Every alternative network_decoder variant, through its converter,
    against the actual reference torch module."""
    _stub_torch_geometric()
    sys.path.insert(0, REF + "/models/POCO")
    import importlib

    import jax
    import jax.numpy as jnp

    from pointdreamer_tpu.models.occupancy.alt import (
        DECODERS, convert_decoder_state_dict)

    TorchDec = getattr(importlib.import_module(module), name)
    torch.manual_seed(1)
    td = TorchDec(32, 2, K=16).eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_decoder_state_dict(sd, name))

    rng = np.random.default_rng(4)
    N, Q, k = 50, 12, 16
    pos = rng.standard_normal((N, 3)).astype(np.float32)
    latents = rng.standard_normal((N, 32)).astype(np.float32)
    queries = rng.standard_normal((Q, 3)).astype(np.float32)
    ids = rng.integers(0, N, (Q, k))

    data = {
        "latents": torch.from_numpy(latents.T[None]),
        "proj_indices": torch.from_numpy(ids[None]),
        "pos": torch.from_numpy(pos.T[None]),
        "pos_non_manifold": torch.from_numpy(queries.T[None]),
    }
    with torch.no_grad():
        want = td(data, spectral_only=True)[0].numpy().T   # [Q, 2]
    got = np.asarray(DECODERS[name](params, jnp.asarray(latents),
                                    jnp.asarray(pos), jnp.asarray(queries),
                                    jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_pointnet_backbone_matches_reference_torch():
    """PointNet segmentation backbone (networks/backbone/pointnet.py)
    through convert_pointnet_state_dict."""
    _stub_torch_geometric()
    sys.path.insert(0, REF + "/models/POCO")
    from networks.backbone.pointnet import PointNet

    import jax
    import jax.numpy as jnp

    from pointdreamer_tpu.models.occupancy.alt import (
        convert_pointnet_state_dict, pointnet_forward)

    torch.manual_seed(2)
    tb = PointNet(3, 32, hidden_dim=64, segmentation=True).eval()
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_pointnet_state_dict(sd))

    rng = np.random.default_rng(5)
    N = 70
    pos = rng.standard_normal((N, 3)).astype(np.float32)
    x = np.ones((N, 3), np.float32)

    data = {"x": torch.from_numpy(x.T[None]),
            "pos": torch.from_numpy(pos.T[None])}
    with torch.no_grad():
        want = tb(data, spectral_only=True)[0].numpy().T   # [N, 32]
    got = np.asarray(pointnet_forward(params, jnp.asarray(x),
                                      {"pos": jnp.asarray(pos)}))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_ddpm_simple_unet_matches_reference_torch():
    """The DDPM 'simple' UNet (guided_diffusion/models.py Model) used by
    DDNM's CelebA/LSUN checkpoints, at a miniature plan."""
    sys.path.insert(0, REF + "/models/DDNM")
    from guided_diffusion.models import Model as TorchModel

    import jax.numpy as jnp

    from pointdreamer_tpu.models.diffusion.ddpm_unet import (
        DDPMPlan, convert_ddpm_state_dict, ddpm_unet_forward)

    class NS:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    cfg = NS(
        model=NS(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=2,
                 attn_resolutions=[8], dropout=0.0, in_channels=3,
                 resamp_with_conv=True, type="simple"),
        data=NS(image_size=16),
        diffusion=NS(num_diffusion_timesteps=1000),
    )
    torch.manual_seed(0)
    tm = TorchModel(cfg).eval()
    plan = DDPMPlan(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=2,
                    attn_resolutions=(8,), in_channels=3, resolution=16,
                    resamp_with_conv=True)
    params = convert_ddpm_state_dict(tm.state_dict())

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([3.0, 555.0], np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                  torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ddpm_unet_forward(plan, params, jnp.asarray(x),
                                       jnp.asarray(t)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_ddpm_init_params_key_parity():
    """init_ddpm_params must produce exactly the torch key set (so shape
    bugs surface offline, without a checkpoint)."""
    sys.path.insert(0, REF + "/models/DDNM")
    from guided_diffusion.models import Model as TorchModel

    from pointdreamer_tpu.models.diffusion.ddpm_unet import (
        DDPMPlan, init_ddpm_params)

    class NS:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    cfg = NS(
        model=NS(ch=32, out_ch=3, ch_mult=[1, 2, 2], num_res_blocks=1,
                 attn_resolutions=[8], dropout=0.0, in_channels=3,
                 resamp_with_conv=True, type="simple"),
        data=NS(image_size=32),
        diffusion=NS(num_diffusion_timesteps=1000),
    )
    tm = TorchModel(cfg)
    plan = DDPMPlan(ch=32, out_ch=3, ch_mult=(1, 2, 2), num_res_blocks=1,
                    attn_resolutions=(8,), in_channels=3, resolution=32)
    ours = init_ddpm_params(plan, seed=1)
    assert set(ours) == set(tm.state_dict().keys())


def test_superres_unet_matches_reference_torch():
    """SuperResModel (reference unet.py:667-683): bilinear-upsampled
    low-res conditioning concatenated on channels, then the plain UNet."""
    sys.path.insert(0, REF + "/models/DDNM")
    from guided_diffusion.unet import SuperResModel as TorchSuperRes

    import jax
    import jax.numpy as jnp

    from pointdreamer_tpu.models.diffusion import SuperResModel, UNetModel
    from pointdreamer_tpu.models.diffusion.convert import (
        convert_torch_state_dict)

    torch.manual_seed(0)
    tm = TorchSuperRes(image_size=16, in_channels=3, model_channels=32,
                       out_channels=6, num_res_blocks=1,
                       attention_resolutions=(2,), channel_mult=(1, 2),
                       num_heads=1, num_head_channels=16,
                       use_scale_shift_norm=True, resblock_updown=True,
                       use_fp16=False).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_torch_state_dict(sd, model_channels=32,
                                      num_res_blocks=1, channel_mult=(1, 2),
                                      attention_ds=(2,))
    ours = SuperResModel(unet=UNetModel(
        model_channels=32, out_channels=6, num_res_blocks=1,
        channel_mult=(1, 2), attention_ds=(2,), num_head_channels=16,
        dtype=jnp.float32))

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    lr = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    t = np.array([5.0, 420.0], np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                  torch.from_numpy(t),
                  low_res=torch.from_numpy(lr.transpose(0, 3, 1, 2)),
                  ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ours.apply(
        {"params": {"unet": jax.tree_util.tree_map(jnp.asarray, params)}},
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(lr)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("pool", ["adaptive", "attention"])
def test_encoder_unet_matches_reference_torch(pool):
    """EncoderUNetModel classifier (reference unet.py:684-850 +
    script_util.create_classifier :229-266): encoder + middle + pooled
    head, both pool modes."""
    sys.path.insert(0, REF + "/models/DDNM")
    from guided_diffusion.unet import EncoderUNetModel as TorchEncoder

    import jax
    import jax.numpy as jnp

    from pointdreamer_tpu.models.diffusion import EncoderUNetModel
    from pointdreamer_tpu.models.diffusion.convert import (
        convert_encoder_state_dict)

    torch.manual_seed(1)
    tm = TorchEncoder(image_size=16, in_channels=3, model_channels=32,
                      out_channels=10, num_res_blocks=1,
                      attention_resolutions=(2,), channel_mult=(1, 2),
                      num_head_channels=16, use_scale_shift_norm=True,
                      resblock_updown=True, use_fp16=False,
                      pool=pool).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_encoder_state_dict(
        sd, model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_ds=(2,), pool=pool)
    ours = EncoderUNetModel(model_channels=32, out_channels=10,
                            num_res_blocks=1, channel_mult=(1, 2),
                            attention_ds=(2,), num_head_channels=16,
                            dtype=jnp.float32, pool=pool)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([7.0, 901.0], np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                  torch.from_numpy(t)).numpy()
    got = np.asarray(ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
