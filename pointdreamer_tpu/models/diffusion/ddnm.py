"""DDNM inpainting sampler: one batched, scanned denoising loop.

Reference: simplified_ddnm_inpainting (models/DDNM/guided_diffusion/
diffusion.py:459-570) — per image sequentially, 100 DDIM steps each, xs
chain staged through CPU.  Here ALL views denoise together in a single
`lax.scan` over the 100-step schedule: 8x fewer UNet launches, zero
host<->device traffic, bf16 UNet under jit.

Faithful to the reference math (with its quirks):
  x0_t       = (x_t - e_t sqrt(1-a_t)) / sqrt(a_t)          (Eq. 12)
  x0_hat     = x0_t - lambda_t Ap(A(x0_t) - y)              (Eq. 17)
  sigma_t    = sqrt(1 - a_next^2)      <- reference's square (:524)
  x_next     = sqrt(a_next) x0_hat + sigma_t (c1 z + c2 e_t) (:548-552)
with sigma_y = 0, eta = 0.85, linear betas 1e-4..0.02, T=1000, 100 steps
(imagenet_256.yml:40-47), time-travel schedule degenerate at
travel_length=1 (get_schedule_jump, diffusion.py:770-791).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(num_timesteps: int = 1000, beta_start: float = 1e-4,
               beta_end: float = 0.02) -> np.ndarray:
    return np.linspace(beta_start, beta_end, num_timesteps,
                       dtype=np.float64)


def get_schedule_jump(t_sampling: int, travel_length: int = 1,
                      travel_repeat: int = 1):
    """Reference diffusion.py:770-791."""
    jumps = {j: travel_repeat - 1
             for j in range(0, t_sampling - travel_length, travel_length)}
    t = t_sampling
    ts = []
    while t >= 1:
        t = t - 1
        ts.append(t)
        if jumps.get(t, 0) > 0:
            jumps[t] = jumps[t] - 1
            for _ in range(travel_length):
                t = t + 1
                ts.append(t)
    ts.append(-1)
    return ts


def compute_alpha(betas: np.ndarray, t: np.ndarray) -> np.ndarray:
    """cumprod(1-beta) with a prepended 1, indexed at t+1
    (reference diffusion.py compute_alpha)."""
    a = np.concatenate([[1.0], np.cumprod(1.0 - betas)])
    return a[np.asarray(t) + 1]


@functools.partial(jax.jit,
                   static_argnames=("model", "t_sampling", "num_timesteps",
                                    "collect_calib"))
def ddnm_inpaint_batch(
    model,                     # flax Module (static): eps = model.apply(...)
    params,
    masked_imgs: jnp.ndarray,  # [B,H,W,3] in [0,1], zeros where unknown
    masks: jnp.ndarray,        # [B,H,W] or [B,H,W,1]; 1 = known pixel
    rng_key: jnp.ndarray,
    t_sampling: int = 100,
    eta: float = 0.85,
    num_timesteps: int = 1000,
    noise: Optional[jnp.ndarray] = None,  # [1+t_sampling,B,H,W,3]: x_T, z_i
    act_scales=None,           # PER-STEP static w8a8 activation scales: a
                               # `calib`-shaped tree with a leading
                               # [n_steps] axis on every leaf (from a
                               # collect_calib=True run); None = dynamic
    collect_calib: bool = False,
):
    """Returns inpainted images [B,H,W,3] in [0,1]; with
    collect_calib=True returns (images, calib) where calib is the tree of
    per-step per-module max|activation| observed by the w8a8 layers
    (leaves [n_steps]) — activation ranges are strongly t-dependent, so
    static int8 scales must be per-step to match dynamic-scale fidelity.

    `noise`, when given, replaces every RNG draw (the x_T init followed by
    one z per step, in draw order) — used by the golden parity test to
    feed the reference torch sampler's exact noise stream."""
    if masks.ndim == 3:
        masks = masks[..., None]
    B, H, W, _ = masked_imgs.shape

    y = masked_imgs * 2.0 - 1.0          # data_transform (rescaled=true)
    y = y * masks                        # y = A(x_orig)

    skip = num_timesteps // t_sampling
    times = get_schedule_jump(t_sampling)
    pairs = np.array(list(zip(times[:-1], times[1:])), dtype=np.int64)
    i_steps = pairs[:, 0] * skip
    j_steps = np.where(pairs[:, 1] < 0, -1, pairs[:, 1] * skip)
    betas = make_betas(num_timesteps)
    at_arr = jnp.asarray(compute_alpha(betas, i_steps), jnp.float32)
    at_next_arr = jnp.asarray(compute_alpha(betas, j_steps), jnp.float32)
    t_arr = jnp.asarray(i_steps, jnp.float32)

    def step_math(x, t, at, at_next, z, scales):
        vars_ = ({"params": params} if scales is None
                 else {"params": params, "act_scales": scales})
        if collect_calib:
            et, mut = model.apply(vars_, x, jnp.full((B,), t),
                                  mutable=["calib"])
            # flax omits empty collections from the mutable return: a model
            # with no sown calib (no quantized layers, or static scales
            # already supplied) yields {} here so the empty-tree fallback
            # in DDNMInpainter.inpaint() actually executes.
            calib = dict(mut).get("calib", {})
        else:
            et = model.apply(vars_, x, jnp.full((B,), t))
            calib = None
        et = et[..., :3].astype(jnp.float32)
        x0_t = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        # sigma_y = 0 -> lambda = 1, gamma = sigma_t (Eq. 19 degenerate)
        sigma_t = jnp.sqrt(1.0 - at_next ** 2)
        x0_hat = x0_t - (x0_t * masks - y)      # Eq. 17 with A=Ap=mask
        c1 = jnp.sqrt(1.0 - at_next) * eta
        c2 = jnp.sqrt(1.0 - at_next) * jnp.sqrt(1.0 - eta ** 2)
        x_next = jnp.sqrt(at_next) * x0_hat + sigma_t * (c1 * z + c2 * et)
        return x_next, calib

    # per-step scales ride the scan's xs (sliced to scalars per iteration)
    sc_xs = (act_scales,) if act_scales is not None else ()

    if noise is None:
        key, sub = jax.random.split(rng_key)
        x = jax.random.normal(sub, (B, H, W, 3), jnp.float32)

        def step(carry, inp):
            x, key = carry
            t, at, at_next = inp[:3]
            sc = inp[3] if act_scales is not None else None
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, x.shape, jnp.float32)
            x_next, calib = step_math(x, t, at, at_next, z, sc)
            return (x_next, key), calib

        (x, _), ys = jax.lax.scan(step, (x, key),
                                  (t_arr, at_arr, at_next_arr) + sc_xs)
    else:
        def step_inj(x, inp):
            t, at, at_next, z = inp[:4]
            sc = inp[4] if act_scales is not None else None
            return step_math(x, t, at, at_next, z, sc)

        x, ys = jax.lax.scan(step_inj, noise[0],
                             (t_arr, at_arr, at_next_arr, noise[1:]) + sc_xs)
    out = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    return (out, ys) if collect_calib else out


class DDNMInpainter:
    """Wrapper bundling the flax UNet + params (reference
    ddnm_inpainting.py:15-44 Inpainter).

    `mesh` (optional jax.sharding.Mesh with 'dp'/'tp' axes) shards the
    view batch over dp and large kernel feature dims over tp — the
    TPU-native replacement for the reference's torch DataParallel
    (diffusion.py:456); GSPMD inserts the collectives.
    """

    def __init__(self, model, params, t_sampling: int = 100,
                 eta: float = 0.85, seed: int = 1234, mesh=None,
                 static_calib: bool = False):
        self.model = model
        self.params = params
        self.t_sampling = t_sampling
        self.eta = eta
        self.seed = seed
        self.mesh = mesh
        # static per-step w8a8 activation scales: True enables calibration
        # on the first inpaint() call (one dynamic-scale trajectory whose
        # per-step activation maxima become the scales), reused for every
        # later call — scales depend on the weights and the schedule, not
        # the shape being textured.  False = dynamic per-call scales.
        self.static_calib = bool(static_calib)
        # 1.1 saturated at flagship scale under cross-shape calibration
        # (one view at 9.5 dB); 1.3 removes it and matches dynamic-scale
        # fidelity there (docs/w8a8_flagship_fidelity_r05{,_margin13}.json)
        self.calib_margin = 1.3
        self._act_scales = None
        if mesh is not None:
            from ...parallel.mesh import shard_params_dp_tp

            self.params = jax.device_put(
                params, shard_params_dp_tp(params, mesh))

    def inpaint(self, masked_imgs, masks, rng_key=None):
        if rng_key is None:
            rng_key = jax.random.PRNGKey(self.seed)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = self.mesh.shape["dp"]
            if masked_imgs.shape[0] % dp == 0:
                s = NamedSharding(self.mesh, P("dp"))
                masked_imgs = jax.device_put(jnp.asarray(masked_imgs), s)
                masks = jax.device_put(jnp.asarray(masks), s)
        if self.static_calib and self._act_scales is None:
            # First call: run the dynamic-scale sampler once, harvesting
            # every w8a8 layer's PER-STEP max|activation| (activation
            # ranges are strongly t-dependent — a single whole-trajectory
            # scale costs ~7 dB; per-step scales match dynamic fidelity,
            # see tests/test_diffusion.py::test_w8a8_static_scales_fidelity).
            # The margin absorbs shape-to-shape content drift on later
            # calls; out-of-range values saturate at +-127.
            _, calib = ddnm_inpaint_batch(
                self.model, self.params, masked_imgs, masks, rng_key,
                self.t_sampling, self.eta, collect_calib=True)
            if jax.tree_util.tree_leaves(calib):
                self._act_scales = jax.tree_util.tree_map(
                    lambda a: (a * self.calib_margin).astype(jnp.float32),
                    calib)
            else:                     # model has no quantized layers
                self.static_calib = False
        # Every call (including the first) returns the static-scale
        # result so outputs are calibration-order independent and the
        # static executable is compiled before any timed steady-state run.
        return ddnm_inpaint_batch(self.model, self.params, masked_imgs,
                                  masks, rng_key, self.t_sampling, self.eta,
                                  act_scales=self._act_scales)
