import os

import pytest

from speechdrivestemplates_tpu.config import CfgNode, get_cfg_defaults

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_defaults_schema():
    cfg = get_cfg_defaults()
    assert cfg.PIPELINE_TYPE is None
    assert cfg.VOICE2POSE.GENERATOR.NORM == "IN"
    assert cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION is None
    assert cfg.DATASET.AUDIO_LENGTH == 68267
    assert cfg.DATASET.NUM_FRAMES == 64
    assert cfg.TRAIN.BATCH_SIZE == 32
    assert cfg.SYS.LOG_INTERVAL == 100
    assert tuple(cfg.SYS.CANVAS_SIZE) == (720, 1280)


@pytest.mark.parametrize("name", [
    "voice2pose_s2g.yaml", "voice2pose_sdt_bp.yaml",
    "voice2pose_sdt_vae.yaml", "pose2pose.yaml"])
def test_presets_merge(name):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, name))
    cfg.freeze()
    assert cfg.PIPELINE_TYPE in ("Voice2Pose", "Pose2Pose")


def test_preset_values():
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "voice2pose_sdt_bp.yaml"))
    assert cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION == 32
    assert cfg.VOICE2POSE.GENERATOR.CLIP_CODE.EXTERNAL_CODE is False
    cfg2 = get_cfg_defaults()
    cfg2.merge_from_file(os.path.join(CONFIG_DIR, "voice2pose_s2g.yaml"))
    assert cfg2.VOICE2POSE.GENERATOR.NORM == "BN"
    assert cfg2.VOICE2POSE.POSE_DISCRIMINATOR.LAMBDA_GAN == 0.1
    assert cfg2.DATASET.HIERARCHICAL_POSE is False


def test_merge_from_list_cli_semantics():
    cfg = get_cfg_defaults()
    cfg.merge_from_list([
        "TRAIN.BATCH_SIZE", "64",
        "DATASET.SPEAKER", "oliver",
        "VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION", "32",
        "TRAIN.LR", "5e-5",
        "SYS.DISTRIBUTED", "True",
    ])
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.DATASET.SPEAKER == "oliver"
    assert cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION == 32
    assert cfg.TRAIN.LR == 5e-5
    assert cfg.SYS.DISTRIBUTED is True


def test_merge_rejects_unknown_key():
    cfg = get_cfg_defaults()
    with pytest.raises(AssertionError):
        cfg.merge_from_list(["NO.SUCH.KEY", "1"])


def test_freeze_blocks_mutation():
    cfg = get_cfg_defaults()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.BATCH_SIZE = 1
    cfg.defrost()
    cfg.TRAIN.BATCH_SIZE = 1
    assert cfg.TRAIN.BATCH_SIZE == 1


def test_clone_independent():
    cfg = get_cfg_defaults()
    c2 = cfg.clone()
    c2.TRAIN.BATCH_SIZE = 7
    assert cfg.TRAIN.BATCH_SIZE == 32


def test_str_renders():
    s = str(get_cfg_defaults())
    assert "VOICE2POSE" in s and "BATCH_SIZE: 32" in s


def test_int_to_float_coercion():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["VOICE2POSE.GENERATOR.LAMBDA_REG", "2"])
    assert cfg.VOICE2POSE.GENERATOR.LAMBDA_REG == 2.0
    assert isinstance(cfg.VOICE2POSE.GENERATOR.LAMBDA_REG, float)
