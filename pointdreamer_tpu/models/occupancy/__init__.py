"""POCO-equivalent implicit occupancy model family.

Reference: models/POCO (FKAConv backbone + InterpAttentionKHeads decoder,
generate_1.py facade, train.py training loop).
"""
from __future__ import annotations

from .convert import init_params, load_torch_checkpoint
from .fkaconv import (backbone_forward, decoder_forward, occupancy_field)
from .network import encode_latents, make_poco_field, query_occupancy
from .spatial import compute_spatial, farthest_point_sampling


def load_poco_field(checkpoint_path: str, logger=None,
                    decoder: str = "InterpAttentionKHeadsNet"):
    """Returns a factory points -> field_fn for pipeline.geometry.

    Reference: create_POCO_network (generate_1.py:54-68); `decoder`
    mirrors the network_decoder config key (generate.py:305).

    Accepts either a reference torch checkpoint (checkpoint.pth, mapped
    through convert.load_torch_checkpoint) or a native checkpoint written
    by train.save_checkpoint (pickle with a 'params' tree — e.g. from
    cli/train_poco_synthetic.py)."""
    import pickle

    import jax
    import jax.numpy as jnp

    if logger:
        logger.info(f"Loading POCO checkpoint {checkpoint_path} "
                    f"(decoder={decoder})")
    try:
        with open(checkpoint_path, "rb") as f:
            blob = pickle.load(f)
        if not (isinstance(blob, dict) and "params" in blob):
            raise ValueError("not a native checkpoint")
        params = blob["params"]
    except (pickle.UnpicklingError, ValueError, EOFError) as e:
        # narrow fallback: only not-a-native-pickle errors route to the
        # torch converter; a corrupt native checkpoint must not surface
        # as an unrelated torch-conversion failure
        if logger:
            logger.info(f"not a native checkpoint ({e!r}); trying the "
                        "torch converter")
        params = load_torch_checkpoint(checkpoint_path)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def factory(points, **field_kwargs):
        # field_kwargs forward to make_poco_field (e.g. noise_std=0.0 for
        # inputs that already carry sensor noise, generate_1.py:71-72)
        return make_poco_field(params, points, decoder=decoder,
                               **field_kwargs)

    return factory
