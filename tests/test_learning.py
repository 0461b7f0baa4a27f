"""Does it actually learn?  Short optimization runs on the synthetic fixture must
reduce the regression loss substantially (catches sign errors, dead gradients,
optimizer miswiring that shape tests cannot)."""

import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
from speechdrivestemplates_tpu.pipelines import get_pipeline

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _run_steps(pipe, cfg, n_steps):
    import jax

    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    step_fn = (pipe._get_train_step() if hasattr(pipe, "_get_train_step")
               else pipe._get_step("train"))
    losses_hist = []
    state = pipe.state
    rng = jax.random.PRNGKey(0)
    i = 0
    while i < n_steps:
        for batch in pipe.train_dataloader:
            rng, sub = jax.random.split(rng)
            state, losses, _ = step_fn(state, pipe._device_batch(batch), sub)
            key = "G_reg_loss" if "G_reg_loss" in losses else "reg_loss"
            losses_hist.append(float(np.asarray(losses[key])))
            i += 1
            if i >= n_steps:
                break
    pipe.state = state
    return losses_hist


def _cfg(preset, root, out):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, preset))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.LR = 1e-3  # aggressive: we want visible progress in ~40 steps
    cfg.TRAIN.LR_SCHEDULER = False
    cfg.TRAIN.VALIDATE = False
    cfg.TRAIN.SAVE_VIDEO = False
    cfg.SYS.OUTPUT_DIR = out
    cfg.SYS.MESH.DATA = 1
    return cfg


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("speakers")
    make_synthetic_speaker(str(root), "oliver", num_train=4, num_dev=2)
    return str(root)


@pytest.mark.slow
def test_voice2pose_learns(data_root, tmp_path):
    cfg = _cfg("voice2pose_sdt_bp.yaml", data_root, str(tmp_path))
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    hist = _run_steps(pipe, cfg, 150)
    early = np.mean(hist[:4])
    late = np.mean(hist[-4:])
    assert late < 0.6 * early, (early, late)
    # the clip-code bank moved off its zero init
    assert float(np.abs(np.asarray(pipe.state["clips_code"])).sum()) > 0


@pytest.mark.slow
def test_pose2pose_learns(data_root, tmp_path):
    cfg = _cfg("pose2pose.yaml", data_root, str(tmp_path))
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    hist = _run_steps(pipe, cfg, 150)
    assert np.mean(hist[-4:]) < 0.7 * np.mean(hist[:4]), (hist[:4], hist[-4:])


def test_multispeaker_union(tmp_path):
    """SPEAKER 'a+b' trains on the union with per-row speaker stats."""
    from speechdrivestemplates_tpu.datasets import get_dataset

    root = tmp_path / "speakers"
    make_synthetic_speaker(str(root), "oliver", num_train=3, num_dev=1, seed=0)
    make_synthetic_speaker(str(root), "kubinec", num_train=2, num_dev=1, seed=1)

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = str(root)
    cfg.DATASET.SPEAKER = "oliver+kubinec"
    ds = get_dataset("GestureDataset")(str(root), "oliver+kubinec", "train", cfg)
    assert len(ds) == 5
    speakers = {ds[i]["speaker"] for i in range(5)}
    assert speakers == {"oliver", "kubinec"}
    # per-row stats differ between speakers
    s0 = ds[0]["speaker_stat"]["mean"]
    s4 = ds[4]["speaker_stat"]["mean"]
    assert ds[0]["speaker"] != ds[4]["speaker"] or np.allclose(s0, s4)
