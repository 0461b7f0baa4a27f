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


@pytest.mark.slow
def test_data_parallel_actually_partitions_compute():
    """XLA's cost model proves the sharded train step PARTITIONS the work
    rather than replicating it: at a fixed global batch, per-device FLOPs on
    an 8-device mesh must be ~1/8 of the single-device step (the residual is
    collectives + replicated scalar work)."""
    import tempfile

    from __graft_entry__ import _flagship_cfg
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    flops = {}
    for n in (1, 8):
        with tempfile.TemporaryDirectory() as tmp:
            make_synthetic_speaker(tmp, "oliver", num_train=16, num_dev=0)
            cfg = _flagship_cfg()
            cfg.DATASET.ROOT_DIR = tmp
            cfg.TRAIN.BATCH_SIZE = 16
            cfg.TRAIN.PRECISION = "fp32"
            cfg.SYS.MESH.DATA = n
            cfg.freeze()
            pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
            pipe.setup_dataset(cfg, "train")
            pipe.setup_model(cfg)
            pipe.setup_optimizer()
            db = pipe._device_batch(next(iter(pipe.train_dataloader)))
            step = pipe._get_train_step()
            ca = step.lower(pipe.state, db,
                            jax.random.PRNGKey(0)).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            f = float(ca.get("flops", 0.0))
            if not f:
                pytest.skip("cost_analysis reports no flops on this backend")
            flops[n] = f

    ratio = flops[1] / flops[8]
    assert 6.5 < ratio <= 8.5, (
        f"expected ~8x per-device FLOP reduction on the 8-device mesh, "
        f"got {ratio:.2f}x ({flops})")
