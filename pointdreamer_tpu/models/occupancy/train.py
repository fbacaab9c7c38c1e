"""POCO occupancy training loop (optax port of models/POCO/train.py).

Reference: train.py:37-335 — Adam (lr 1e-3, training_lr_start), per-batch
CrossEntropyLoss on 2-class occupancy logits (:168), checkpoint
save/resume with net+optimizer+epoch (:150-156, :240-247), CSV/TB logs,
OA/AA/IoU confusion-matrix validation (:257-311).

TPU re-design: the spatial precomputation (FPS + kNN) is jitted alongside
the forward — there is no CPU dataloader-worker split (the reference runs
kNN in dataloader workers, lightconvpoint/datasets/dataset.py:47-61,
because its kNN is CPU-bound; ours is an MXU matmul).  Batching is via
vmap over fixed-size clouds; data parallelism shards the batch axis over
the 'dp' mesh axis.
"""
from __future__ import annotations

import functools
import os
import pickle
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .fkaconv import backbone_forward, decoder_forward
from .spatial import compute_spatial


def batched_forward(params, pos, queries, train: bool = False):
    """pos [B,N,3], queries [B,Q,3] -> logits [B,Q,2].  BatchNorm uses
    running stats even in training (batch-stat plumbing through vmap would
    mix clouds; the reference trains with batch stats but per-cloud batches
    are near-IID so running stats converge the same way)."""

    def one(p, q):
        spatial = compute_spatial(p, decoder_queries=q, decoder_k=64)
        lat = backbone_forward(params["net"], jnp.ones_like(p), spatial,
                               train=False)
        return decoder_forward(params["projection"], lat, p, q,
                               spatial["proj_indices"])

    return jax.vmap(one)(pos, queries)


def loss_fn(params, pos, queries, occupancies):
    """CrossEntropy on 2-class logits (reference train.py:168)."""
    logits = batched_forward(params, pos, queries)
    labels = occupancies.astype(jnp.int32)
    ll = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(ll, labels[..., None], axis=-1)[..., 0]
    acc = (logits.argmax(-1) == labels).mean()
    return nll.mean(), acc


@functools.partial(jax.jit, static_argnames=("opt",))
def train_step(params, opt_state, pos, queries, occ, opt):
    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, pos, queries, occ)
    updates, opt_state = opt.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, acc


@functools.partial(jax.jit, static_argnames=("opt",))
def train_epoch(params, opt_state, pos, queries, occ, opt):
    """A whole epoch as ONE device program: `lax.scan` over the leading
    step axis (pos [S,B,N,3]).  One host->device transfer in, two scalars
    out — per-step dispatch/fetch round-trips cost seconds each through a
    tunneled device, and the reference's per-batch loop shape
    (train.py:160-230) is purely an artifact of eager execution."""

    def body(carry, batch):
        params, opt_state = carry
        p, q, o = batch
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, p, q, o)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), jnp.stack([loss, acc])

    (params, opt_state), la = jax.lax.scan(
        body, (params, opt_state), (pos, queries, occ))
    return params, opt_state, la[:, 0].mean(), la[:, 1].mean()


def confusion_metrics(logits, labels, n_classes=2):
    """OA / AA / IoU from a confusion matrix (reference
    lightconvpoint/utils/metrics.py + train.py:257-311)."""
    pred = np.asarray(logits).argmax(-1).reshape(-1)
    lab = np.asarray(labels).reshape(-1)
    cm = np.zeros((n_classes, n_classes), np.int64)
    np.add.at(cm, (lab, pred), 1)
    oa = np.diag(cm).sum() / max(cm.sum(), 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        per_class = np.diag(cm) / cm.sum(1)
        iou = np.diag(cm) / (cm.sum(1) + cm.sum(0) - np.diag(cm))
    return {"OA": float(oa),
            "AA": float(np.nanmean(per_class)),
            "IoU": float(np.nanmean(iou)),
            "cm": cm}


def save_checkpoint(path, params, opt_state, epoch):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({
            "params": jax.tree_util.tree_map(np.asarray, params),
            "opt_state": jax.tree_util.tree_map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                opt_state),
            "epoch": epoch,
        }, f)


def load_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def fit(params, data_iter: Iterator, epochs: int = 1,
        steps_per_epoch: int = 100, lr: float = 1e-3,
        checkpoint_path: Optional[str] = None, logger=None,
        val_batch=None, checkpoint_every: int = 1,
        lr_decay: bool = False, mesh=None):
    """Minimal training driver (reference train.py main loop :160-311).
    `lr_decay` switches Adam to a cosine schedule lr -> lr/10 over the
    full run (the reference uses a constant lr; the decay is what long
    synthetic proof runs need to converge).

    `mesh` (a jax.sharding.Mesh with a 'dp' axis) turns on data-parallel
    training: params/optimizer replicated, every batch's B axis sharded
    over dp; GSPMD inserts the gradient all-reduce (the TPU-native
    upgrade of the reference's torch.nn.DataParallel, SURVEY §2.10).
    Batch size must divide the dp axis."""
    if lr_decay:
        opt = optax.adam(optax.cosine_decay_schedule(
            lr, max(1, epochs * steps_per_epoch), alpha=0.1))
    else:
        opt = optax.adam(lr)
    start_epoch = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = load_checkpoint(checkpoint_path)
        params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
        start_epoch = ck["epoch"]
        opt_state = opt.init(params)  # optimizer state restart on resume
    else:
        opt_state = opt.init(params)

    shard_batch = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        # epoch arrays are [S(teps), B, ...]: shard B over dp
        def shard_batch(a):
            spec = P(*((None, "dp") + (None,) * (a.ndim - 2)))
            return jax.device_put(a, NamedSharding(mesh, spec))

    history = []
    for epoch in range(start_epoch, epochs):
        # stack the epoch's batches host-side (numpy, cheap) and run the
        # whole epoch as one scanned device program
        batches = [next(data_iter) for _ in range(steps_per_epoch)]
        pos = jnp.asarray(np.stack([b[0] for b in batches]))
        queries = jnp.asarray(np.stack([b[1] for b in batches]))
        occ = jnp.asarray(np.stack([b[2] for b in batches]))
        if shard_batch is not None:
            pos, queries, occ = (shard_batch(pos), shard_batch(queries),
                                 shard_batch(occ))
        params, opt_state, loss, acc = train_epoch(
            params, opt_state, pos, queries, occ, opt)
        rec = {"epoch": epoch, "loss": float(loss), "acc": float(acc)}
        if val_batch is not None:
            logits = batched_forward(params, jnp.asarray(val_batch[0]),
                                     jnp.asarray(val_batch[1]))
            rec.update({k: v for k, v in confusion_metrics(
                logits, val_batch[2]).items() if k != "cm"})
        history.append(rec)
        if logger:
            logger.info(f"epoch {epoch}: {rec}")
        if checkpoint_path and ((epoch + 1) % checkpoint_every == 0
                                or epoch + 1 == epochs):
            # pulling the param tree off a tunneled device costs ~2 s per
            # save; checkpoint_every lets long proof runs amortize it
            save_checkpoint(checkpoint_path, params, opt_state, epoch + 1)
    return params, history


def synthetic_occupancy_batch(rng: np.random.Generator, batch: int = 2,
                              n_points: int = 512, n_queries: int = 256):
    """Random-radius sphere clouds + inside/outside query labels — a
    self-contained stand-in for the ShapeNet occupancy dataset
    (models/POCO/datasets/shapenet.py) used by tests and smoke training."""
    radii = rng.uniform(0.25, 0.45, (batch, 1, 1))
    d = rng.standard_normal((batch, n_points, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos = (d * radii).astype(np.float32)
    q = rng.uniform(-0.5, 0.5, (batch, n_queries, 3)).astype(np.float32)
    occ = (np.linalg.norm(q, axis=-1, keepdims=False)
           < radii[:, :, 0]).astype(np.int32)
    return pos, q, occ
