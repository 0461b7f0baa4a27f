"""Data-parallel mesh tests on the 8-virtual-device CPU backend."""

import sys
import os

import jax
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_and_batch_sharding():
    from speechdrivestemplates_tpu.parallel import get_data_mesh, shard_batch

    mesh = get_data_mesh(8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


@pytest.mark.slow
def test_dryrun_multichip():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 64, 2, 121)
