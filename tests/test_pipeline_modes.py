"""Pipeline mode coverage beyond the main e2e slices: the GAN/s2g configuration
(BN + discriminator + non-hierarchical pose), eval-time code sampling modes,
frame-variant codes, and bf16 precision."""

import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
from speechdrivestemplates_tpu.pipelines import get_pipeline

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("speakers")
    make_synthetic_speaker(str(root), "oliver", num_train=8, num_dev=4)
    return str(root)


def _cfg(preset, data_root, out_dir, **overrides):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, preset))
    cfg.DATASET.ROOT_DIR = data_root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.NUM_EPOCHS = 1
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TEST.BATCH_SIZE = 4
    cfg.TRAIN.SAVE_VIDEO = False
    cfg.TEST.SAVE_VIDEO = False
    cfg.TEST.SAVE_NPZ = False
    cfg.TRAIN.SAVE_NPZ = False
    cfg.TRAIN.VALIDATE = False
    cfg.SYS.OUTPUT_DIR = out_dir
    cfg.SYS.MESH.DATA = 1  # single-device mesh: these tests cover task logic
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def _one_train_step(pipe, cfg):
    import jax

    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    batch = next(iter(pipe.train_dataloader))
    step_fn = pipe._get_train_step()
    state, losses, results = step_fn(pipe.state, pipe._device_batch(batch),
                                     jax.random.PRNGKey(0))
    pipe.state = state
    return {k: float(np.asarray(v)) for k, v in losses.items()}, results


@pytest.mark.slow
def test_s2g_gan_train_step(data_root, tmp_path):
    """voice2pose_s2g: BN norm, LSGAN discriminator, HIERARCHICAL_POSE=False
    (exercises the parted->global renorm path for the FGD encoder)."""
    cfg = _cfg("voice2pose_s2g.yaml", data_root, str(tmp_path))
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    losses, _ = _one_train_step(pipe, cfg)
    for key in ["G_loss", "G_reg_loss", "G_pose_gan_loss", "D_pose_gan_loss",
                "pose_score_fake", "pose_score_real", "L2_dist"]:
        assert key in losses, sorted(losses)
        assert np.isfinite(losses[key]), (key, losses[key])
    # two train steps must update D params
    assert "params_d" in pipe.state


@pytest.mark.slow
def test_frame_variant_code(data_root, tmp_path):
    cfg = _cfg("voice2pose_sdt_bp.yaml", data_root, str(tmp_path),
               **{"VOICE2POSE.GENERATOR.CLIP_CODE.FRAME_VARIANT": True})
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    losses, _ = _one_train_step(pipe, cfg)
    assert pipe.state["clips_code"].shape == (8, 32, 64)
    assert np.isfinite(losses["G_loss"])


@pytest.mark.slow
def test_bf16_precision(data_root, tmp_path):
    cfg = _cfg("voice2pose_sdt_bp.yaml", data_root, str(tmp_path),
               **{"TRAIN.PRECISION": "bf16"})
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    losses, _ = _one_train_step(pipe, cfg)
    assert np.isfinite(losses["G_loss"])


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["normal", "gt_code", "random_row"])
def test_eval_code_sampling_modes(data_root, tmp_path, mode):
    import jax

    overrides = {}
    if mode == "normal":
        overrides["VOICE2POSE.GENERATOR.CLIP_CODE.SAMPLE_FROM_NORMAL"] = True
    elif mode == "gt_code":
        overrides["VOICE2POSE.GENERATOR.CLIP_CODE.TEST_WITH_GT_CODE"] = True
    cfg = _cfg("voice2pose_sdt_bp.yaml", data_root, str(tmp_path), **overrides)
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    batch = next(iter(pipe.train_dataloader))
    num_frames = int(np.asarray(batch["num_frames"])[0])
    step_fn = pipe._get_eval_step(num_frames, batch["audio"].shape[-1] // 160 + 1)
    losses, results = step_fn(pipe.state, pipe._device_batch(batch),
                              jax.random.PRNGKey(1), None)
    assert np.asarray(results["condition_code"]).shape == (4, 32)
    assert np.isfinite(float(np.asarray(losses["G_reg_loss"])))


@pytest.mark.slow
def test_demo_code_index_interpolation(data_root, tmp_path):
    import jax
    import jax.numpy as jnp

    cfg = _cfg("voice2pose_sdt_bp.yaml", data_root, str(tmp_path),
               **{"DEMO.CODE_INDEX": 0, "DEMO.CODE_INDEX_B": 1})
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    # make the two bank rows distinct
    pipe.state["clips_code"] = pipe.state["clips_code"].at[0].set(1.0).at[1].set(-1.0)
    batch = next(iter(pipe.train_dataloader))
    batch.pop("poses")  # demo mode has no GT
    batch.pop("poses_score")
    num_frames = int(np.asarray(batch["num_frames"])[0])
    step_fn = pipe._get_eval_step(num_frames, batch["audio"].shape[-1] // 160 + 1)
    _, r0 = step_fn(pipe.state, pipe._device_batch(batch), jax.random.PRNGKey(0),
                    jnp.float32(0.0))
    _, r1 = step_fn(pipe.state, pipe._device_batch(batch), jax.random.PRNGKey(0),
                    jnp.float32(1.0))
    _, rh = step_fn(pipe.state, pipe._device_batch(batch), jax.random.PRNGKey(0),
                    jnp.float32(0.5))
    c0 = np.asarray(r0["condition_code"])
    c1 = np.asarray(r1["condition_code"])
    ch = np.asarray(rh["condition_code"])
    np.testing.assert_allclose(c0[0], np.full(32, 1.0), atol=1e-6)
    np.testing.assert_allclose(c1[0], np.full(32, -1.0), atol=1e-6)
    np.testing.assert_allclose(ch, (c0 + c1) / 2, atol=1e-6)
