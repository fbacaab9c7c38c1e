"""DDPM eps-matching trainer for the guided-diffusion UNet.

The reference ships no diffusion trainer (the UNet is download-only,
guided_diffusion/diffusion.py:435-457); this is the offline proof path:
train a small UNetModel on an analytic image family
(synthetic_images.py) with the standard DDPM objective
||eps - eps_theta(sqrt(a_t) x0 + sqrt(1-a_t) eps, t)||^2 over the SAME
linear-beta schedule the DDNM sampler uses (ddnm.make_betas), then run
`ddnm_inpaint_batch` with the trained weights.

TPU shape: one jitted `lax.scan` per epoch; every batch (images, t, eps)
is synthesized ON DEVICE from the carried PRNG key — zero host<->device
data traffic, no per-step dispatch round-trips (those cost seconds each
through a tunneled device).
"""
from __future__ import annotations

import functools
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .ddnm import make_betas
from .synthetic_images import sample_images


@functools.partial(jax.jit, static_argnames=("model", "opt", "steps",
                                             "batch", "res"))
def train_epoch(model, params, opt_state, key, opt, steps: int,
                batch: int, res: int, num_timesteps: int = 1000):
    """One scanned epoch of device-generated batches -> mean loss."""
    acum = jnp.asarray(np.cumprod(1.0 - make_betas(num_timesteps)),
                       jnp.float32)

    def loss_fn(p, x0, t, eps):
        a = acum[t][:, None, None, None]
        xt = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * eps
        pred = model.apply({"params": p}, xt,
                           t.astype(jnp.float32))[..., :3]
        return jnp.mean((pred.astype(jnp.float32) - eps) ** 2)

    def body(carry, _):
        params, opt_state, key = carry
        key, k1, k2, k3 = jax.random.split(key, 4)
        x0 = sample_images(k1, batch, res) * 2.0 - 1.0   # [-1,1] domain
        t = jax.random.randint(k2, (batch,), 0, num_timesteps)
        eps = jax.random.normal(k3, x0.shape, jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, t, eps)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    (params, opt_state, key), losses = jax.lax.scan(
        body, (params, opt_state, key), None, length=steps)
    return params, opt_state, key, losses.mean()


def fit_ddpm(model, params, epochs: int = 20, steps_per_epoch: int = 100,
             batch: int = 64, res: int = 32, lr: float = 2e-4,
             seed: int = 0, checkpoint_path: Optional[str] = None,
             logger=None, checkpoint_every: int = 10):
    """Training driver mirroring models/occupancy/train.py fit()."""
    opt = optax.adam(optax.cosine_decay_schedule(
        lr, max(1, epochs * steps_per_epoch), alpha=0.1))
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(seed)
    history = []
    for epoch in range(epochs):
        params, opt_state, key, loss = train_epoch(
            model, params, opt_state, key, opt, steps_per_epoch, batch, res)
        history.append({"epoch": epoch, "loss": float(loss)})
        if logger:
            logger.info(f"ddpm epoch {epoch}: loss {float(loss):.5f}")
        if checkpoint_path and ((epoch + 1) % checkpoint_every == 0
                                or epoch + 1 == epochs):
            save_ddpm_checkpoint(checkpoint_path, params)
    return params, history


def save_ddpm_checkpoint(path: str, params) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"params": jax.tree_util.tree_map(np.asarray, params)},
                    f)


def load_ddpm_checkpoint(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)["params"]
