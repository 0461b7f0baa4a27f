"""Device-resident train-set cache (DATASET.DEVICE_CACHE, trainer.py).

The cache turns each training batch into an on-device gather by clip index
instead of a host SoA gather + device_put.  It must be invisible to the
numerics: same DataLoader index schedule, same batch values, same training
trajectory.  (No reference counterpart — the reference re-collates and
re-uploads every batch, core/pipelines/trainer.py:383-405.)
"""

import numpy as np
import pytest

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
from speechdrivestemplates_tpu.pipelines import get_pipeline


def _mk_cfg(root, **over):
    cfg = get_cfg_defaults()
    cfg.merge_from_file("configs/pose2pose.yaml")
    cfg.DATASET.ROOT_DIR = str(root)
    cfg.DATASET.SPEAKER = "oliver"
    cfg.DATASET.CACHING = True
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.VALIDATE = False
    cfg.TRAIN.SAVE_VIDEO = False
    cfg.TRAIN.SAVE_NPZ = False
    for k, v in over.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def speaker_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("devcache_spk")
    make_synthetic_speaker(str(root), "oliver", num_train=16, num_dev=0)
    return root


def _run_epochs(cfg, n_epochs=2):
    """Drive the real trainer loop (prefetch included) and return final state
    snapshots plus the device batches the loop consumed."""
    import jax

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    seen = []
    for epoch in range(1, n_epochs + 1):
        pipe.train_dataloader.set_epoch(epoch)
        for t_step, (batch, db) in enumerate(
                pipe._device_prefetch(pipe.train_dataloader)):
            seen.append(jax.device_get(db))
            pipe.train_step(batch, t_step + 1, t_step, epoch, device_batch=db)
    return jax.device_get(pipe.state), seen


def test_device_cache_trajectory_matches_host_path(speaker_root):
    """2 epochs with the cache on vs off: identical batches, identical final
    parameters (the cache may not change training by one ulp)."""
    s_off, b_off = _run_epochs(_mk_cfg(speaker_root,
                                       **{"DATASET.DEVICE_CACHE": "off"}))
    s_on, b_on = _run_epochs(_mk_cfg(speaker_root,
                                     **{"DATASET.DEVICE_CACHE": "on"}))

    assert len(b_off) == len(b_on) and len(b_off) == 4  # 16/8 x 2 epochs
    for a, b in zip(b_off, b_on):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(
                *[np.asarray(x[k]) if not isinstance(x[k], dict) else
                  np.concatenate([np.ravel(v) for v in x[k].values()])
                  for x in (a, b)], err_msg=k)

    import jax

    flat_off = jax.tree.leaves(s_off["params_ae"])
    flat_on = jax.tree.leaves(s_on["params_ae"])
    for x, y in zip(flat_off, flat_on):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_device_cache_eligibility_gates(speaker_root):
    """'auto' silently falls back (no CACHING / artifact saving on); 'on'
    raises with the reason; the val loader never engages it."""
    cfg = _mk_cfg(speaker_root, **{"DATASET.DEVICE_CACHE": "auto",
                                   "DATASET.CACHING": False})
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    assert pipe._device_cache_gather(pipe.train_dataloader) is None

    cfg = _mk_cfg(speaker_root, **{"DATASET.DEVICE_CACHE": "on",
                                   "TRAIN.SAVE_VIDEO": True})
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    with pytest.raises(ValueError, match="artifact saving"):
        pipe._device_cache_gather(pipe.train_dataloader)

    # too-large budget bound: 'auto' falls back, 'on' raises
    cfg = _mk_cfg(speaker_root, **{"DATASET.DEVICE_CACHE": "auto",
                                   "DATASET.DEVICE_CACHE_MAX_MB": 0})
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    assert pipe._device_cache_gather(pipe.train_dataloader) is None


def test_device_cache_on_data_mesh(speaker_root):
    """Under the 8-device CPU mesh the gathered batches carry the same
    'data'-axis sharding as shard_batch's, so the jitted step partitions
    identically (one epoch must run end to end)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    cfg = _mk_cfg(speaker_root, **{"DATASET.DEVICE_CACHE": "on"})
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    gather = pipe._device_cache_gather(pipe.train_dataloader)
    idx = pipe.train_dataloader.index_batches()[0]
    db = gather(idx)
    shard_counts = {len(db[k].sharding.device_set) for k in ("poses",)}
    assert shard_counts == {8}
    pipe.train_dataloader.set_epoch(1)
    for t_step, (batch, dbi) in enumerate(
            pipe._device_prefetch(pipe.train_dataloader)):
        assert batch is None
        pipe.train_step(batch, t_step + 1, t_step, 1, device_batch=dbi)
