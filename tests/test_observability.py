"""Observability subsystems: jax.profiler trace hook and the TensorBoard video sink."""

import glob
import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
from speechdrivestemplates_tpu.pipelines import get_pipeline

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.slow
def test_profiler_trace_written(tmp_path):
    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=2)

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.NUM_EPOCHS = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.VALIDATE = False
    cfg.TRAIN.SAVE_VIDEO = False
    cfg.SYS.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SYS.MESH.DATA = 1
    cfg.SYS.PROFILE.ENABLED = True
    cfg.SYS.PROFILE.START_STEP = 1
    cfg.SYS.PROFILE.NUM_STEPS = 1
    cfg.SYS.PROFILE.OUT_DIR = str(tmp_path / "profile")
    cfg.freeze()

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.train(cfg, "prof-TRAIN-t", None)

    traces = glob.glob(str(tmp_path / "profile" / "**" / "*"), recursive=True)
    assert any("trace" in t or t.endswith(".pb") or t.endswith(".json.gz")
               for t in traces), traces


def test_tensorboard_video_sink(tmp_path, rng):
    class FakeWriter:
        def __init__(self):
            self.calls = []

        def add_video(self, tag, vid, step, fps):
            self.calls.append((tag, vid.shape, step, fps))

    from speechdrivestemplates_tpu.utils.video import VideoWriter

    cfg = get_cfg_defaults()
    cfg.SYS.VIDEO_FORMAT = ["tensorboard"]
    cfg.freeze()
    vw = VideoWriter(cfg)
    writer = FakeWriter()
    frames = (rng.rand(4, 100, 160, 3) * 255).astype(np.uint8)
    vw.save_video(cfg, "TRAIN", frames, step=3, epoch=1, global_step=10,
                  writer=writer, base_path=str(tmp_path))
    assert len(writer.calls) == 1
    tag, shape, step, fps = writer.calls[0]
    assert tag == "train/video" and step == 10 and fps == 15
    assert shape[0] == 1 and shape[2] == 3  # (1, T, 3, h, w)
