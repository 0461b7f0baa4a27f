"""End-to-end slices on the synthetic fixture: train -> checkpoint -> resume,
--test_only, --demo_input, for both pipelines (SURVEY.md §7 stage 5/6)."""

import glob
import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.datasets.synthetic import (make_demo_wav,
                                                          make_synthetic_speaker)
from speechdrivestemplates_tpu.pipelines import get_pipeline

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("speakers")
    make_synthetic_speaker(str(root), "oliver", num_train=8, num_dev=4)
    return str(root)


def _base_cfg(preset, data_root, out_dir):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, preset))
    cfg.DATASET.ROOT_DIR = data_root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.NUM_EPOCHS = 1
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TEST.BATCH_SIZE = 4
    cfg.TRAIN.SAVE_VIDEO = False
    cfg.TEST.SAVE_VIDEO = False
    cfg.TEST.SAVE_NPZ = True
    cfg.TRAIN.VALIDATE = True
    cfg.SYS.OUTPUT_DIR = out_dir
    cfg.SYS.LOG_INTERVAL = 1
    # task-logic e2e runs on a single-device mesh (batch 4); the true
    # data-parallel path is covered by test_data_parallel_e2e + dryrun_multichip
    cfg.SYS.MESH.DATA = 1
    return cfg


@pytest.mark.slow
def test_data_parallel_e2e(data_root, tmp_path):
    """Full training epoch with the batch sharded over all 8 virtual devices."""
    out = str(tmp_path / "out")
    cfg = _base_cfg("voice2pose_sdt_bp.yaml", data_root, out)
    cfg.SYS.MESH.DATA = -1  # all 8
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.TRAIN.VALIDATE = False
    cfg.TRAIN.SAVE_VIDEO = False
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.train(cfg, "e2e-dp", None)
    assert int(np.asarray(pipe.state["step"])) == 1  # 8 clips / batch 8


def _latest_ckpt(out_dir):
    ckpts = glob.glob(os.path.join(out_dir, "*", "checkpoints", "checkpoint_*"))
    assert ckpts, f"no checkpoint written under {out_dir}"
    return sorted(ckpts)[-1]


@pytest.mark.slow
def test_voice2pose_sdt_bp_train_test_demo(data_root, tmp_path):
    out = str(tmp_path / "out")
    cfg = _base_cfg("voice2pose_sdt_bp.yaml", data_root, out)
    cfg.freeze()

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.train(cfg, "e2e-TRAIN-t", None)

    ckpt = _latest_ckpt(out)

    # --test_only
    pipe2 = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    losses = pipe2.test(cfg, "e2e-TEST-t", ckpt)
    assert "L2_dist" in losses and np.isfinite(float(losses["L2_dist"]))
    assert "FGD_mu" in losses

    # --demo_input
    wav = make_demo_wav(str(tmp_path / "demo.wav"), seconds=4.27)
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.SYS.VIDEO_FORMAT = ["img"]
    cfg2.TEST.SAVE_VIDEO = True
    cfg2.freeze()
    pipe3 = get_pipeline(cfg2.PIPELINE_TYPE)(cfg2)
    pipe3.demo(cfg2, "e2e-DEMO-t", ckpt, wav)
    demo_npz = glob.glob(os.path.join(out, "*DEMO*", "results", "*.npz"))
    assert demo_npz
    arr = np.load(demo_npz[0])
    assert arr["poses_pred_batch"].shape[1:] == (64, 2, 121)


@pytest.mark.slow
def test_voice2pose_resume(data_root, tmp_path):
    out = str(tmp_path / "out")
    cfg = _base_cfg("voice2pose_sdt_bp.yaml", data_root, out)
    cfg.TRAIN.VALIDATE = False
    cfg.freeze()

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.train(cfg, "e2e-TRAIN-r", None)
    ckpt = _latest_ckpt(out)

    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.TRAIN.NUM_EPOCHS = 2
    cfg2.freeze()
    pipe2 = get_pipeline(cfg2.PIPELINE_TYPE)(cfg2)
    pipe2.train(cfg2, "e2e-TRAIN-r2", ckpt)
    # resumed run continues the step counter and reuses the original directory
    assert int(np.asarray(pipe2.state["step"])) > int(
        ckpt.split("step-")[-1].rstrip("/"))
    ckpts_after = glob.glob(os.path.join(os.path.dirname(ckpt), "checkpoint_*"))
    assert len(ckpts_after) >= 2


@pytest.mark.slow
def test_pose2pose_train_and_code_bank(data_root, tmp_path):
    out = str(tmp_path / "out")
    cfg = _base_cfg("pose2pose.yaml", data_root, out)
    cfg.freeze()

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.train(cfg, "e2e-TRAIN-p2p", None)

    # the per-clip code banks were scatter-updated during training
    mu = np.asarray(pipe.state["clip_code_mu"])
    assert mu.shape == (8, 32)
    assert np.abs(mu).sum() > 0

    ckpt = _latest_ckpt(out)
    tree = pipe.load_checkpoint_tree(ckpt)
    assert "clip_code_mu" in tree["state"]


@pytest.mark.slow
def test_sdt_vae_external_code_from_p2p_checkpoint(data_root, tmp_path):
    """Checkpoint-mediated coupling (SURVEY §3.4): Pose2Pose ckpt -> SDT-VAE
    external code bank + frozen FGD encoder."""
    out = str(tmp_path / "out")
    p2p = _base_cfg("pose2pose.yaml", data_root, out)
    p2p.TRAIN.VALIDATE = False
    p2p.freeze()
    pipe = get_pipeline(p2p.PIPELINE_TYPE)(p2p)
    pipe.train(p2p, "e2e-p2p", None)
    ae_ckpt = _latest_ckpt(out)

    out2 = str(tmp_path / "out2")
    cfg = _base_cfg("voice2pose_sdt_vae.yaml", data_root, out2)
    cfg.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT = ae_ckpt
    cfg.TRAIN.VALIDATE = False
    cfg.freeze()
    pipe2 = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe2.train(cfg, "e2e-vae", None)
    # external bank must equal the p2p mu bank (frozen; no optimizer on it)
    np.testing.assert_allclose(np.asarray(pipe2.state["clips_code"]),
                               np.asarray(pipe.state["clip_code_mu"]), atol=1e-6)


@pytest.mark.slow
def test_ragged_eval_multi_device(data_root, tmp_path):
    """Eval on an 8-device mesh with a val count NOT divisible by the device
    count: the ragged last batch pads to the device multiple, losses are
    computed on exactly the true rows (pad_eval_batch + in-step slicing), and
    the epoch losses EQUAL a 1-device run on the same checkpoint — the
    reference's eval-any-size semantics (reference trainer.py:104-123,429-457)
    under TPU meshes."""
    root = str(tmp_path / "speakers")
    # 6 dev clips: batch 8 on 8 devices -> one batch of 6 -> pad 2
    make_synthetic_speaker(root, "oliver", num_train=8, num_dev=6)
    out = str(tmp_path / "out")

    cfg = _base_cfg("voice2pose_sdt_bp.yaml", root, out)
    cfg.SYS.MESH.DATA = -1  # all 8 virtual devices
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.TRAIN.VALIDATE = True  # exercises the ragged VAL path during training
    # deterministic eval code (fixed bank row) so losses are comparable
    # across different batch groupings (the default eval mode samples a
    # random bank row per batch)
    cfg.DEMO.CODE_INDEX = 0
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.train(cfg, "ragged-TRAIN", None)
    ckpt = _latest_ckpt(out)

    losses_8 = get_pipeline(cfg.PIPELINE_TYPE)(cfg).test(cfg, "ragged-TEST8",
                                                         ckpt)
    assert np.isfinite(float(losses_8["L2_dist"]))

    cfg1 = cfg.clone()
    cfg1.defrost()
    cfg1.SYS.MESH.DATA = 1
    cfg1.TEST.BATCH_SIZE = 4  # different batching; 6 = 4 + ragged 2
    cfg1.freeze()
    losses_1 = get_pipeline(cfg1.PIPELINE_TYPE)(cfg1).test(cfg1, "ragged-TEST1",
                                                           ckpt)

    # batch-separable metrics must agree between meshes/batchings (the KL is
    # batch-statistics-based, so it legitimately depends on batch grouping;
    # FGD is an epoch metric over identical accumulated rows)
    for k in ("G_reg_loss", "L2_dist", "lip_sync_error_n", "FGD_mu",
              "FGD_mu_logvar"):
        np.testing.assert_allclose(
            float(losses_8[k]), float(losses_1[k]), rtol=2e-5,
            err_msg=f"{k} differs between 8-device and 1-device eval")


@pytest.mark.slow
def test_ragged_eval_pose2pose(data_root, tmp_path):
    """Pose2Pose --test_only with a ragged val split on the 8-device mesh."""
    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=8, num_dev=3)
    out = str(tmp_path / "out")

    cfg = _base_cfg("pose2pose.yaml", root, out)
    cfg.SYS.MESH.DATA = -1
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8  # 3 dev clips -> single ragged batch of 3
    cfg.TRAIN.VALIDATE = False
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.train(cfg, "ragged-p2p", None)
    ckpt = _latest_ckpt(out)

    losses = get_pipeline(cfg.PIPELINE_TYPE)(cfg).test(cfg, "ragged-p2p-T",
                                                       ckpt)
    assert np.isfinite(float(losses["L2_dist"]))
    assert np.isfinite(float(losses["loss"]))
