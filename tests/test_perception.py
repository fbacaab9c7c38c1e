"""Numerical parity of the flax perception models (VGG16/LPIPS,
InceptionV3) against torch transcriptions of the reference architectures
(lpips.LPIPS(net='vgg') and torchvision inception_v3 as wrapped by
utils/metric_utils/inception.py), through the state-dict converters.

torchvision/lpips are not installed here, so the torch side is a
line-faithful transcription of those architectures (same module/key
layout); with real pretrained files the same converters apply unchanged.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from pointdreamer_tpu.models.perception import (
    InceptionV3Features, LPIPS, VGG16Features)
from pointdreamer_tpu.models.perception.convert import (
    VGG16_TV_CONV_IDX, convert_inception_state_dict,
    convert_lpips_state_dict, convert_vgg16_state_dict,
    random_inception_state_dict, random_lpips_lin_state_dict,
    random_vgg16_state_dict)
from pointdreamer_tpu.models.perception.vgg import (
    LPIPS_CHANNELS, VGG16_PLAN, _SHIFT, _SCALE)


# ---------------------------------------------------------------------------
# torch reference modules (transcriptions)
# ---------------------------------------------------------------------------

def torch_vgg16_features():
    """torchvision vgg16 .features (cfg D) as nn.Sequential."""
    layers = []
    in_c = 3
    for item in VGG16_PLAN:
        if item == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_c, item, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_c = item
    return tnn.Sequential(*layers)


class TorchLPIPS(tnn.Module):
    """lpips.LPIPS(net='vgg') math: scaling layer, vgg taps, unit
    normalization, squared diff, lin heads, spatial mean, sum."""

    def __init__(self, vgg_sd, lin_sd):
        super().__init__()
        self.net = torch_vgg16_features()
        self.net.load_state_dict(
            {k.replace("features.", ""): torch.as_tensor(v)
             for k, v in vgg_sd.items()})
        self.lins = [torch.as_tensor(lin_sd[f"lin{k}.model.1.weight"])
                     for k in range(5)]
        self.shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        self.scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
        # relu layer indices in the Sequential after which LPIPS taps
        conv_seq_idx = []
        i = 0
        for item in VGG16_PLAN:
            if item == "M":
                i += 1
            else:
                conv_seq_idx.append(i)
                i += 2
        self.tap_after = [conv_seq_idx[c] + 1 for c in (1, 3, 6, 9, 12)]

    def taps(self, x):
        out = []
        for i, layer in enumerate(self.net):
            x = layer(x)
            if i in self.tap_after:
                out.append(x)
        return out

    def forward(self, a, b):
        fa = self.taps((a - self.shift) / self.scale)
        fb = self.taps((b - self.shift) / self.scale)
        total = 0.0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (xa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = xb / (xb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb).pow(2)
            w = tF.conv2d(d, self.lins[k])
            total = total + w.mean(dim=(2, 3))[:, 0]
        return total


class TBasic(tnn.Module):
    def __init__(self, i, o, k, s=1, p=0):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, k, stride=s, padding=p, bias=False)
        self.bn = tnn.BatchNorm2d(o, eps=1e-3)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


class TIncA(tnn.Module):
    def __init__(self, i, pool):
        super().__init__()
        self.branch1x1 = TBasic(i, 64, 1)
        self.branch5x5_1 = TBasic(i, 48, 1)
        self.branch5x5_2 = TBasic(48, 64, 5, p=2)
        self.branch3x3dbl_1 = TBasic(i, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, p=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, p=1)
        self.branch_pool = TBasic(i, pool, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(tF.avg_pool2d(x, 3, 1, 1))], 1)


class TIncB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = TBasic(i, 384, 3, s=2)
        self.branch3x3dbl_1 = TBasic(i, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, p=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, s=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            tF.max_pool2d(x, 3, 2)], 1)


class TIncC(tnn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = TBasic(i, 192, 1)
        self.branch7x7_1 = TBasic(i, c7, 1)
        self.branch7x7_2 = TBasic(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, (7, 1), p=(3, 0))
        self.branch7x7dbl_1 = TBasic(i, c7, 1)
        self.branch7x7dbl_2 = TBasic(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, (1, 7), p=(0, 3))
        self.branch_pool = TBasic(i, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(tF.avg_pool2d(x, 3, 1, 1))], 1)


class TIncD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = TBasic(i, 192, 1)
        self.branch3x3_2 = TBasic(192, 320, 3, s=2)
        self.branch7x7x3_1 = TBasic(i, 192, 1)
        self.branch7x7x3_2 = TBasic(192, 192, (1, 7), p=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, (7, 1), p=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, 3, s=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3,
                  self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([self.branch3x3_2(self.branch3x3_1(x)), b7,
                          tF.max_pool2d(x, 3, 2)], 1)


class TIncE(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch1x1 = TBasic(i, 320, 1)
        self.branch3x3_1 = TBasic(i, 384, 1)
        self.branch3x3_2a = TBasic(384, 384, (1, 3), p=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, (3, 1), p=(1, 0))
        self.branch3x3dbl_1 = TBasic(i, 448, 1)
        self.branch3x3dbl_2 = TBasic(448, 384, 3, p=1)
        self.branch3x3dbl_3a = TBasic(384, 384, (1, 3), p=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, (3, 1), p=(1, 0))
        self.branch_pool = TBasic(i, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(tF.avg_pool2d(x, 3, 1, 1))], 1)


class TorchInception(tnn.Module):
    """torchvision Inception3 cut at the final average pool."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasic(3, 32, 3, s=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, 3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, 3, p=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, 1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, 3)
        self.Mixed_5b = TIncA(192, 32)
        self.Mixed_5c = TIncA(256, 64)
        self.Mixed_5d = TIncA(288, 64)
        self.Mixed_6a = TIncB(288)
        self.Mixed_6b = TIncC(768, 128)
        self.Mixed_6c = TIncC(768, 160)
        self.Mixed_6d = TIncC(768, 160)
        self.Mixed_6e = TIncC(768, 192)
        self.Mixed_7a = TIncD(768)
        self.Mixed_7b = TIncE(1280)
        self.Mixed_7c = TIncE(2048)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tF.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tF.max_pool2d(x, 3, 2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                  self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                  self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                  self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        return x.mean(dim=(2, 3))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_vgg16_feature_parity():
    sd = random_vgg16_state_dict(0)
    tmodel = torch_vgg16_features()
    tmodel.load_state_dict({k.replace("features.", ""): torch.as_tensor(v)
                            for k, v in sd.items()})
    tmodel.eval()

    params = convert_vgg16_state_dict(sd)
    fmodel = VGG16Features()

    rng = np.random.default_rng(1)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    taps_f = fmodel.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        xt = torch.as_tensor(x.transpose(0, 3, 1, 2))
        acts = []
        conv_seq_idx = []
        i = 0
        for item in VGG16_PLAN:
            if item == "M":
                i += 1
            else:
                conv_seq_idx.append(i)
                i += 2
        tap_after = {conv_seq_idx[c] + 1 for c in (1, 3, 6, 9, 12)}
        h = xt
        for j, layer in enumerate(tmodel):
            h = layer(h)
            if j in tap_after:
                acts.append(h.numpy().transpose(0, 2, 3, 1))
    assert len(acts) == len(taps_f) == 5
    for a, b in zip(acts, taps_f):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-3, atol=1e-3)


def test_lpips_parity():
    vgg_sd = random_vgg16_state_dict(0)
    lin_sd = random_lpips_lin_state_dict(1)
    tmodel = TorchLPIPS(vgg_sd, lin_sd)
    tmodel.eval()

    params = convert_lpips_state_dict(vgg_sd, lin_sd)
    fmodel = LPIPS()

    rng = np.random.default_rng(2)
    a = rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1
    b = rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1
    df = np.asarray(fmodel.apply({"params": params},
                                 jnp.asarray(a), jnp.asarray(b)))
    with torch.no_grad():
        dt = tmodel(torch.as_tensor(a.transpose(0, 3, 1, 2)),
                    torch.as_tensor(b.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(df, dt, rtol=1e-3, atol=1e-5)


def test_inception_feature_parity():
    sd = random_inception_state_dict(0)
    tmodel = TorchInception()
    tmodel.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    tmodel.eval()

    params, stats = convert_inception_state_dict(sd)
    fmodel = InceptionV3Features(resize_input=False, normalize_input=False)

    rng = np.random.default_rng(3)
    x = rng.random((1, 299, 299, 3)).astype(np.float32)
    ff = np.asarray(fmodel.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(x)))
    with torch.no_grad():
        ft = tmodel(torch.as_tensor(x.transpose(0, 3, 1, 2))).numpy()
    assert ff.shape == ft.shape == (1, 2048)
    np.testing.assert_allclose(ff, ft, rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_fid_pipeline_with_random_inception(tmp_path):
    """End-to-end: save a random torch-layout checkpoint, load through the
    public helper, embed images, compute a Frechet distance."""
    sd = random_inception_state_dict(0)
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()},
               tmp_path / "inception.pth")

    from pointdreamer_tpu.eval import metrics as M
    from pointdreamer_tpu.models.perception import load_inception_features

    feats = load_inception_features(str(tmp_path / "inception.pth"),
                                    batch=4)
    rng = np.random.default_rng(4)
    a = rng.random((6, 64, 64, 3)).astype(np.float32)
    b = rng.random((6, 64, 64, 3)).astype(np.float32)
    fa, fb = feats(a), feats(b)
    assert fa.shape == (6, 2048)
    fid_same = M.fid_from_features(fa, fa)
    fid_diff = M.fid_from_features(fa, fb)
    assert abs(fid_same) < 1e-4
    assert np.isfinite(fid_diff)
