"""Host-side rendering and video-writer tests (headless)."""

import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.utils import viz


@pytest.fixture
def poses(rng):
    return (rng.randn(8, 2, 121) * 40).astype(np.float32)  # (T, 2, K)


def test_vis_relative_pose_clip(poses):
    frames = viz.vis_relative_pose_clip(poses, (180, 320))
    assert frames.shape == (8, 180, 320, 3)
    assert frames.dtype == np.uint8
    # something was drawn (not all white)
    assert (frames < 250).any()


def test_vis_pair_clip(poses):
    frames = viz.vis_relative_pose_pair_clip(poses, poses, (180, 320))
    assert frames.shape == (8, 180, 320, 3)


def test_filmstrip(poses):
    img = viz.draw_pose_frames_in_long_img(poses.transpose(0, 2, 1))
    assert img.ndim == 3 and img.shape[0] == 720


def test_draw_body_parts_layouts(rng):
    for k in (121, 135, 137):
        img = np.zeros((100, 100, 3), np.uint8)
        viz.draw_body_parts(img, rng.rand(k, 2) * 100)
    with pytest.raises(NotImplementedError):
        viz.draw_body_parts(np.zeros((10, 10, 3), np.uint8), np.zeros((99, 2)))


def test_vis_train_npz(tmp_path, rng):
    p = str(tmp_path / "clip.npz")
    np.savez(p, pose=(rng.randn(4, 3, 137) * 50 + 200).astype(np.float32))
    frames = viz.vis_train_npz(p, out_dir=str(tmp_path), max_frames=2)
    assert len(frames) == 2
    assert os.path.exists(tmp_path / "frame_000000.jpg")


def test_video_writer_mp4_and_img(tmp_path, rng):
    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.utils.video import VideoWriter

    cfg = get_cfg_defaults()
    cfg.SYS.VIDEO_FORMAT = ["mp4", "img"]
    cfg.freeze()
    vw = VideoWriter(cfg)
    frames = (rng.rand(6, 90, 160, 3) * 255).astype(np.uint8)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)
    long_img = (np.ones((720, 900, 3)) * 255).astype(np.uint8)

    vw.save_video(cfg, "DEMO", frames, step=1, epoch=0, long_img=long_img,
                  audio=audio, base_path=str(tmp_path))
    assert os.path.exists(tmp_path / "imgs" / "epoch0-DEMO-step1.jpg")
    vids = os.listdir(tmp_path / "videos")
    assert any(v.endswith(".mp4") for v in vids)


def test_video_writer_async(tmp_path, rng):
    import time

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.utils.video import VideoWriter

    cfg = get_cfg_defaults()
    cfg.SYS.VIDEO_FORMAT = ["img"]
    cfg.SYS.ASYNC_VIDEO_SAVING = True
    cfg.freeze()
    vw = VideoWriter(cfg)
    long_img = (np.ones((720, 900, 3)) * 255).astype(np.uint8)
    vw.save_video(cfg, "DEMO", None, step=2, epoch=0, long_img=long_img,
                  base_path=str(tmp_path))
    vw.q.join()
    assert os.path.exists(tmp_path / "imgs" / "epoch0-DEMO-step2.jpg")


def test_vis_train_npz_align_image(tmp_path, rng):
    """align_image=True renders over the frame images referenced by 'imgs'."""
    import cv2

    from speechdrivestemplates_tpu.utils import viz

    img_path = str(tmp_path / "orig.jpg")
    cv2.imwrite(img_path, np.full((720, 1280, 3), 50, np.uint8))
    pose = (rng.rand(3, 3, 137) * 200 + 200).astype(np.float32)
    p = str(tmp_path / "clip.npz")
    np.savez(p, pose=pose,
             imgs=np.array([img_path.encode(), b"", b"/nope.jpg"]))
    frames = viz.vis_train_npz(p, out_dir=str(tmp_path), align_image=True)
    assert len(frames) == 3
    # frame 0 drew over the dark original; frames 1-2 fell back to the canvas
    assert frames[0].mean() < 100 and frames[1].mean() > 150
    assert (tmp_path / "frame_000000.jpg").exists()


def test_vis_train_csv_dir(tmp_path, rng):
    from speechdrivestemplates_tpu.utils import viz

    spk = tmp_path / "bob"
    spk.mkdir()
    import pandas as pd

    rows = []
    for i in range(3):
        pose = (rng.rand(2, 3, 137) * 200 + 200).astype(np.float32)
        np.savez(str(spk / f"clip_{i}.npz"), pose=pose)
        rows.append({"dataset": "train", "pose_fn": f"clip_{i}.npz",
                     "speaker": "bob"})
    pd.DataFrame(rows).to_csv(str(spk / "processed_137.csv"), index=False)

    out = tmp_path / "render"
    rendered = viz.vis_train_csv_dir(str(tmp_path), "bob", out_dir=str(out),
                                     max_frames=1, max_clips=2)
    assert len(rendered) == 2
    assert (out / "clip_0" / "frame_000000.jpg").exists()
    assert (out / "clip_1" / "frame_000000.jpg").exists()


def test_cal_speaker_scalar(tmp_path):
    import importlib.util as ilu
    import os
    import sys

    dp = os.path.join(os.path.dirname(__file__), "..", "data_preprocess")
    sys.path.insert(0, dp)
    try:
        import generate_dataset_utils as gdu
    finally:
        sys.path.pop(0)

    # a mean table whose shoulders (kp 2 vs 5) sit exactly oliver's width
    # apart must produce oliver's own scalar
    mean = np.zeros((1, 2, 137))
    mean[0, 0, 2] = gdu.OLIVER_SHOULDER_DIST
    p = str(tmp_path / "mean_std-global.npz")
    np.savez(p, mean=mean, std=np.ones((1, 2, 137)))
    assert abs(gdu.cal_speaker_scalar(p) - gdu.OLIVER_SCALAR) < 1e-12
    # half the shoulder width -> double the scalar
    mean[0, 0, 2] /= 2
    np.savez(p, mean=mean, std=np.ones((1, 2, 137)))
    assert abs(gdu.cal_speaker_scalar(p) - 2 * gdu.OLIVER_SCALAR) < 1e-12
