"""Sharding tests on the virtual 8-device CPU mesh + graft entry dryrun."""
import importlib.util
import os
import sys

import jax
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_and_param_sharding():
    from pointdreamer_tpu.parallel.mesh import make_mesh, shard_params_dp_tp
    import jax.numpy as jnp

    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    params = {"dense": {"kernel": jnp.zeros((16, 32)), "bias": jnp.zeros(3)}}
    sh = shard_params_dp_tp(params, mesh)
    assert "tp" in str(sh["dense"]["kernel"].spec)
    assert sh["dense"]["bias"].spec == jax.sharding.PartitionSpec()


def _load_graft():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_8():
    mod = _load_graft()
    mod.dryrun_multichip(8)  # asserts internally


def test_entry_compiles_tiny():
    # entry() builds the full 256-channel flagship UNet; compiling it on
    # CPU in CI is too slow, so only validate the contract shape here
    mod = _load_graft()
    assert callable(mod.entry)
