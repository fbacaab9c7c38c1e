"""Perception feature extractors for the evaluation protocol.

Flax re-implementations of the two pretrained networks the reference's
evaluation scripts rely on (reference: data/run_evaluation.py:141-215,
utils/metric_utils/inception.py):

- ``VGG16Features`` / ``LPIPS`` — lpips.LPIPS(net='vgg') perceptual
  distance (VGG16 feature stack + learned linear heads).
- ``InceptionV3Features`` — torchvision inception_v3 pool3 features for
  FID.

Weights are user-supplied torch state dicts; ``convert.py`` maps them to
these modules (parity-tested in tests/test_perception.py).
"""
from pointdreamer_tpu.models.perception.inception import InceptionV3Features
from pointdreamer_tpu.models.perception.vgg import LPIPS, VGG16Features


def _load_torch_state_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def load_inception_features(ckpt_path: str, batch: int = 32):
    """torchvision inception_v3 state dict -> callable embedding images
    [N,H,W,3] float [0,1] to pool3 features [N,2048] (the FID embedding
    of reference utils/metric_utils/inception.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointdreamer_tpu.models.perception.convert import (
        convert_inception_state_dict)

    params, stats = convert_inception_state_dict(
        _load_torch_state_dict(ckpt_path))
    model = InceptionV3Features()
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }
    apply = jax.jit(lambda x: model.apply(variables, x))

    def feats(images):
        images = np.asarray(images, np.float32)
        out = [np.asarray(apply(jnp.asarray(images[s:s + batch])))
               for s in range(0, len(images), batch)]
        return np.concatenate(out, 0)

    return feats


def load_lpips(vgg_ckpt_path: str, lpips_ckpt_path: str, batch: int = 16):
    """torchvision vgg16 + lpips vgg.pth lin heads -> callable
    lpips(a, b) over images [N,H,W,3] float [0,1] -> [N] distances
    (reference run_evaluation.py:141-160 feeds pred*2-1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointdreamer_tpu.models.perception.convert import (
        convert_lpips_state_dict)

    params = convert_lpips_state_dict(
        _load_torch_state_dict(vgg_ckpt_path),
        _load_torch_state_dict(lpips_ckpt_path))
    model = LPIPS()
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    apply = jax.jit(lambda a, b: model.apply(variables, a, b))

    def dist(a, b):
        a = np.asarray(a, np.float32) * 2.0 - 1.0
        b = np.asarray(b, np.float32) * 2.0 - 1.0
        out = [np.asarray(apply(jnp.asarray(a[s:s + batch]),
                                jnp.asarray(b[s:s + batch])))
               for s in range(0, len(a), batch)]
        return np.concatenate(out, 0)

    return dist


__all__ = ["InceptionV3Features", "LPIPS", "VGG16Features",
           "load_inception_features", "load_lpips"]
