"""Tri-plane color field for invisible-area completion.

Reference: models/TextureField/TF_Network.py (ConvONet LocalDecoder over
xz/xy/yz 32-channel 64^2 feature planes) used decoder-only by
paint_invisible_areas_by_optimize (pointdreamer/unproject.py:39-91):
the planes are free parameters optimized with Adam lr 1e-2 x 400 steps to
regress the input point colors (MSE on rgb in [-1,1]), then queried at
unseen atlas texels.

TPU re-design: the whole fit is one jitted lax.scan (optax.adam); plane
sampling is a vectorized bilinear gather; the decoder is the ConvONet
LocalDecoder (fc_p + 5 ResNet-FC blocks with per-block feature fusion,
reference models/TextureField/convonet.py:576-660).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ...ops.image import bilinear_sample


class TriplaneColorField(NamedTuple):
    planes: Dict[str, jnp.ndarray]   # xz/xy/yz: [R, R, C]
    decoder: Dict[str, jnp.ndarray]

    @staticmethod
    def init(key, plane_res: int = 64, channels: int = 32,
             hidden: int = 32, blocks: int = 5):
        kp, kd = jax.random.split(key)
        planes = {
            name: jax.random.normal(jax.random.fold_in(kp, i),
                                    (plane_res, plane_res, channels))
            for i, name in enumerate(("xz", "xy", "yz"))
        }
        keys = jax.random.split(kd, 2 + 2 * blocks + blocks)
        dec = {
            "fc_p": _dense_init(keys[0], 3, hidden),
            "fc_out": _dense_init(keys[1], hidden, 3),
        }
        for b in range(blocks):
            dec[f"fc_c{b}"] = _dense_init(keys[2 + b], channels, hidden)
            dec[f"block{b}_0"] = _dense_init(keys[2 + blocks + b],
                                             hidden, hidden)
            dec[f"block{b}_1"] = _dense_init(
                keys[2 + 2 * blocks + b], hidden, hidden, zero=True)
        return TriplaneColorField(planes=planes, decoder=dec)


def _dense_init(key, i, o, zero=False):
    w = (jnp.zeros((i, o)) if zero
         else jax.random.normal(key, (i, o)) / jnp.sqrt(i))
    return {"w": w, "b": jnp.zeros(o)}


def _dense(p, x):
    return x @ p["w"] + p["b"]


def _sample_planes(planes, xyz01):
    """xyz01 in [0,1]^3 -> summed plane features [N, C]
    (normalize_coordinate + bilinear grid_sample, convonet.py:42-141)."""
    f = bilinear_sample(planes["xz"], xyz01[:, (0, 2)])
    f = f + bilinear_sample(planes["xy"], xyz01[:, (0, 1)])
    f = f + bilinear_sample(planes["yz"], xyz01[:, (1, 2)])
    return f


def field_forward(field: TriplaneColorField, xyz: jnp.ndarray,
                  blocks: int = 5) -> jnp.ndarray:
    """xyz in [-0.5, 0.5]^3 -> rgb in [-1, 1] (pred_rgb,
    TF_Network.py:77-83)."""
    xyz01 = jnp.clip(xyz + 0.5, 0.0, 1.0)
    c = _sample_planes(field.planes, xyz01)
    dec = field.decoder
    h = _dense(dec["fc_p"], xyz)
    for b in range(blocks):
        h = h + _dense(dec[f"fc_c{b}"], c)
        dx = _dense(dec[f"block{b}_1"],
                    jax.nn.relu(_dense(dec[f"block{b}_0"],
                                       jax.nn.relu(h))))
        h = h + dx
    return jnp.tanh(_dense(dec["fc_out"], jax.nn.relu(h)))


@functools.partial(jax.jit, static_argnames=("iterations",))
def fit_color_field(key, xyz, rgb01, iterations: int = 400,
                    lr: float = 1e-2):
    """Fit the field to input point colors (unproject.py:62-74:
    Adam lr 1e-2, MSE on rgb*2-1, 400 iters)."""
    field = TriplaneColorField.init(key)
    target = rgb01 * 2.0 - 1.0
    opt = optax.adam(lr)

    def loss_fn(f):
        pred = field_forward(f, xyz)
        return jnp.mean((pred - target) ** 2)

    def step(carry, _):
        f, s = carry
        loss, g = jax.value_and_grad(loss_fn)(f)
        upd, s = opt.update(g, s)
        f = optax.apply_updates(f, upd)
        return (f, s), loss

    (field, _), losses = jax.lax.scan(step, (field, opt.init(field)),
                                      None, length=iterations)
    return field, losses


def get_textured_mesh(vertices, faces, input_xyz, input_rgb01,
                      atlas_res: int = 1024, iterations: int = 400,
                      rng_key=None):
    """Full TextureField generator path (reference TF_Network.py:112-224,
    unused by the demo): fit the color field to the input cloud, then bake
    a complete texture atlas for the given mesh by evaluating the field at
    every covered texel.  Returns a core.mesh.Mesh."""
    import numpy as np

    from ...core.mesh import Mesh
    from ...pipeline import unwrap as punwrap
    from ...pipeline.complete import dilate_atlas

    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    uvs, fuv = punwrap.unwrap(np.asarray(vertices), np.asarray(faces),
                              atlas_res=atlas_res)
    baked = punwrap.bake_atlas(jnp.asarray(vertices), jnp.asarray(faces),
                               uvs, fuv, atlas_res)
    field, _ = fit_color_field(key, jnp.asarray(input_xyz),
                               jnp.asarray(input_rgb01), iterations)
    pred = field_forward(field, baked["gb_pos"].reshape(-1, 3))
    atlas = jnp.clip(pred * 0.5 + 0.5, 0.0, 1.0).reshape(
        atlas_res, atlas_res, 3)
    atlas = dilate_atlas(atlas, baked["mask"])
    return Mesh(vertices=np.asarray(vertices), faces=np.asarray(faces),
                uvs=uvs, face_uv_idx=fuv, texture=np.asarray(atlas))


def fit_and_paint(atlas_img, atlas_painted, gb_pos, atlas_mask,
                  input_xyz, input_rgb01, iterations: int = 400,
                  rng_key=None):
    """complete_unseen_by='optimize' path: fit on the input cloud, predict
    colors at unseen covered texels (unproject.py:76-80)."""
    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    field, _ = fit_color_field(key, input_xyz, input_rgb01, iterations)
    unseen = atlas_mask & ~atlas_painted
    pred = field_forward(field, gb_pos.reshape(-1, 3))
    pred01 = jnp.clip(pred * 0.5 + 0.5, 0.0, 1.0).reshape(atlas_img.shape)
    return jnp.where(unseen[..., None], pred01, atlas_img)
