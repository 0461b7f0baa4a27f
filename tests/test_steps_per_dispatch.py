"""Dispatch amortization (TRAIN.STEPS_PER_DISPATCH, trainer.py).

K train steps run inside ONE device dispatch as a ``lax.scan`` over on-device
clip-index gathers from the HBM-resident train cache.  The floor analysis
(docs/PERF.md) measured the pose2pose step at 88% host-dispatch overhead per
call; the scan bounds that at 1/K per step.  It must be invisible to the
numerics: same DataLoader index schedule, same per-step PRNG stream, same
training trajectory as one dispatch per step.  (No reference counterpart —
the reference dispatches per step, core/pipelines/trainer.py:383-405.)
"""

import logging
import time

import numpy as np
import pytest

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
from speechdrivestemplates_tpu.pipelines import get_pipeline


def _mk_cfg(root, preset="configs/pose2pose.yaml", **over):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(preset)
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
    root = tmp_path_factory.mktemp("chunked_spk")
    # 32 train clips / batch 8 -> 4 batches/epoch, so K=3 exercises a full
    # chunk AND the remainder chunk (L=1) every epoch
    make_synthetic_speaker(str(root), "oliver", num_train=32, num_dev=0)
    return root


def _run(cfg, n_epochs=2):
    """Drive epochs exactly as Trainer.train() does (chunked when
    STEPS_PER_DISPATCH > 1 and the cache engages, per-step otherwise) and
    return the final state + step counter."""
    import jax

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    gs = 0
    for epoch in range(1, n_epochs + 1):
        pipe.step_tic = time.time()
        pipe.train_dataloader.set_epoch(epoch)
        cache = pipe._chunk_cache_or_none(cfg)
        if cache is not None:
            gs = pipe._train_epoch_chunked(cfg, epoch, gs, cache)
        else:
            for t_step, (batch, db) in enumerate(
                    pipe._device_prefetch(pipe.train_dataloader)):
                gs += 1
                pipe.train_step(batch, t_step + 1, gs, epoch, device_batch=db)
    return jax.device_get(pipe.state), gs, pipe


# State keys holding raw encoder ACTIVATIONS (the pose2pose code banks are
# each clip's mu/logvar from its last visit, trainer-scattered, not
# optimizer-updated).  Activations amplify params drift through the BN
# stack ~50×: measured on this fixture, per-step-vs-chunked loss diff is 0
# at step 1 (proving identical batches + RNG) and 3.6e-5 by step 8, params
# drift ≤2e-4, bank drift ≤1e-2.  A wrong batch/RNG shifts banks by O(1).
_ACTIVATION_KEYS = {"clip_code_mu", "clip_code_logvar"}


def _assert_state_close(s_ref, s_chunked, keys):
    """Same trajectory up to compile-order float reassociation: the scan body
    and the standalone step compile to differently-fused programs, so a few
    ulps of grad drift per step get amplified by Adam's rescaling on
    near-zero-gradient elements.  The guard is statistical — ≥99.9% of
    elements must match tightly and the worst element must stay small —
    because a wrong batch or RNG (what this test exists to catch) shifts
    MOST elements by O(0.01–1)."""
    import jax

    for key in keys:
        ref, got = jax.tree.leaves(s_ref[key]), jax.tree.leaves(s_chunked[key])
        assert len(ref) == len(got)
        x = np.concatenate([np.asarray(a, np.float64).ravel() for a in ref])
        y = np.concatenate([np.asarray(a, np.float64).ravel() for a in got])
        err = np.abs(x - y)
        if key in _ACTIVATION_KEYS:
            assert err.max() < 5e-2, (
                f"{key}: worst activation diff {err.max():.3e} exceeds cap")
            assert err.mean() < 5e-3, (
                f"{key}: mean activation diff {err.mean():.3e} exceeds cap")
            continue
        frac = (err <= 1e-4 + 2e-3 * np.abs(x)).mean()
        assert frac >= 0.999, (
            f"{key}: only {frac:.6f} of elements within tolerance "
            f"(max abs diff {err.max():.3e})")
        assert err.max() < 2e-3, (
            f"{key}: worst element diff {err.max():.3e} exceeds cap")


def test_chunked_matches_per_step_pose2pose(speaker_root):
    """2 epochs at K=3 (chunks of 3+1 per epoch) vs one dispatch per step:
    same final params, code banks, and step counter."""
    s_ref, gs_ref, _ = _run(_mk_cfg(speaker_root))
    cfg = _mk_cfg(speaker_root, **{"TRAIN.STEPS_PER_DISPATCH": 3})
    s_chk, gs_chk, pipe = _run(cfg)

    assert gs_ref == gs_chk == 8  # 4 batches x 2 epochs
    assert int(np.asarray(s_chk["step"])) == 8
    # both chunk lengths (3 and the remainder 1) compiled and ran
    assert sorted(pipe._scan_cache) == [1, 3]
    _assert_state_close(s_ref, s_chk,
                        ["params_ae", "clip_code_mu", "clip_code_logvar"])


def test_chunked_loss_trajectory_matches(speaker_root):
    """Step-for-step loss parity, the sharp batch/RNG discriminator: the
    scan's stacked loss rows must equal the per-step losses to float noise
    from the FIRST step (a wrong index schedule or RNG stream shifts step-1
    loss by O(1); reassociation drift only compounds later)."""
    import jax
    import jax.numpy as jnp

    cfg = _mk_cfg(speaker_root)
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    step_fn = pipe._get_step("train")
    per_step = []
    for epoch in (1, 2):
        pipe.train_dataloader.set_epoch(epoch)
        for _, (batch, db) in enumerate(
                pipe._device_prefetch(pipe.train_dataloader)):
            db = db if db is not None else pipe._device_batch(batch)
            pipe.state, losses, _ = step_fn(pipe.state, db, pipe._next_rng())
            per_step.append(float(np.asarray(losses["loss"])))

    cfg = _mk_cfg(speaker_root, **{"TRAIN.STEPS_PER_DISPATCH": 3})
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    cache = pipe._chunk_cache_or_none(cfg)
    assert cache is not None
    if "step" not in pipe.state:
        pipe.state["step"] = jnp.asarray(0, jnp.int32)
    chunked = []
    for epoch in (1, 2):
        pipe.train_dataloader.set_epoch(epoch)
        batches = pipe.train_dataloader.index_batches()
        for c0 in range(0, len(batches), 3):
            chunk = batches[c0:c0 + 3]
            idx = jnp.asarray(np.stack(chunk), dtype=jnp.int32)
            rngs = jnp.stack([pipe._next_rng() for _ in range(len(chunk))])
            pipe.state, losses = pipe._get_train_scan(len(chunk))(
                pipe.state, cache, idx, rngs)
            chunked.extend(np.asarray(losses["loss"]).tolist())

    assert len(per_step) == len(chunked) == 8
    assert abs(per_step[0] - chunked[0]) < 1e-6, "step-1 loss must match"
    for i, (a, b) in enumerate(zip(per_step, chunked)):
        assert abs(a - b) < 1e-3, f"step {i+1}: {a} vs {b}"


@pytest.mark.slow
def test_chunked_matches_per_step_voice2pose(speaker_root):
    """The flagship SDT-BP step (3 optimizers, GAN, code bank, FGD encoder
    stats) through the same scan: trajectory parity at K=2."""
    preset = "configs/voice2pose_sdt_bp.yaml"
    s_ref, gs_ref, _ = _run(_mk_cfg(speaker_root, preset), n_epochs=1)
    cfg = _mk_cfg(speaker_root, preset, **{"TRAIN.STEPS_PER_DISPATCH": 2})
    s_chk, gs_chk, _ = _run(cfg, n_epochs=1)

    assert gs_ref == gs_chk == 4
    keys = [k for k in ("params_g", "params_d", "clips_code") if k in s_ref]
    assert "params_g" in keys and "clips_code" in keys
    _assert_state_close(s_ref, s_chk, keys)


def test_chunked_falls_back_without_cache(speaker_root, caplog):
    """K>1 without the device cache (CACHING off) falls back to per-step with
    one logged reason — and still trains correctly."""
    cfg = _mk_cfg(speaker_root, **{"TRAIN.STEPS_PER_DISPATCH": 4,
                                   "DATASET.CACHING": False})
    with caplog.at_level(logging.WARNING):
        s, gs, pipe = _run(cfg, n_epochs=1)
    assert gs == 4
    assert pipe._chunk_cache_or_none(cfg) is None
    assert any("falling back to one dispatch per step" in r.message
               for r in caplog.records)
    # the warning is one-time
    n = sum("falling back" in r.message for r in caplog.records)
    assert n == 1


def test_chunked_logs_per_step_rows(speaker_root, caplog):
    """LOG_INTERVAL lines still appear per step from the scan's stacked loss
    rows, with the right step/global_step numbering."""
    cfg = _mk_cfg(speaker_root, **{"TRAIN.STEPS_PER_DISPATCH": 3,
                                   "SYS.LOG_INTERVAL": 2})
    with caplog.at_level(logging.INFO):
        _run(cfg, n_epochs=1)
    lines = [r.message for r in caplog.records
             if r.message.startswith("[TRAIN]") and "step:" in r.message]
    assert any("step: 2/4" in ln and "global_step: 2" in ln for ln in lines)
    assert any("step: 4/4" in ln and "global_step: 4" in ln for ln in lines)
    assert all("loss" in ln for ln in lines)
