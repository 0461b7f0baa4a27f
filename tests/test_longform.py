"""Long-form windowed inference: plan/stitch units + windowed-vs-full closeness."""

import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.ops.longform import (plan_windows, stitch_windows,
                                                    window_audio)


def test_plan_covers_everything():
    for t in [64, 65, 100, 180, 640, 1000]:
        plan = plan_windows(t, window_frames=64, halo_frames=16)
        covered = np.zeros(t, bool)
        for s, w in plan:
            covered[s: s + w] = True
        assert covered.all(), t
        assert all(s + 64 <= t or s == t - 64 or t < 64 for s, _ in plan)


def test_stitch_constant_signal_is_exact(rng):
    """Cross-fading windows of one constant signal must reproduce it exactly."""
    t = 180
    plan = plan_windows(t, 64, 16)
    target = rng.randn(t, 2, 5).astype(np.float32)
    windows = np.stack([target[s: s + w] for s, w in plan])
    out = stitch_windows(windows, plan, t, halo_frames=16)
    np.testing.assert_allclose(out, target, atol=1e-5)


def test_window_audio_shapes():
    from speechdrivestemplates_tpu.utils.audio import parse_audio_length

    audio_len, num_frames = parse_audio_length(16000 * 12, 16000, 15)
    audio = np.random.RandomState(0).randn(audio_len).astype(np.float32)
    windows, plan = window_audio(audio, num_frames, 64, 16)
    assert windows.shape[1] == int(64 * 16000 / 15)
    assert len(plan) == len(windows)


@pytest.mark.slow
def test_windowed_demo_matches_full_forward(tmp_path):
    """Windowed inference must track the single-forward result away from seams."""
    import jax

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import (
        make_demo_wav, make_synthetic_speaker)
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=2)
    wav = make_demo_wav(str(tmp_path / "demo.wav"), seconds=12.0)

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", "configs",
                                     "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.SYS.MESH.DATA = 1
    cfg.DEMO.WINDOWED = True
    cfg.DEMO.CODE_INDEX = 0  # pin the style code so both paths use the same one
    cfg.freeze()

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "demo", demo_input=wav)
    pipe.num_train_samples = 4
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    pipe.state["clips_code"] = pipe.state["clips_code"].at[0].set(0.5)

    batch = next(iter(pipe.test_dataloader))
    num_frames = int(np.asarray(batch["num_frames"])[0])
    assert num_frames == 180  # 12 s at 15 fps

    windowed = pipe._windowed_demo_forward(batch, num_frames, None)
    pred_w = np.asarray(windowed["poses_pred_batch"][0])  # (T, 2, 121)
    assert pred_w.shape == (num_frames, 2, 121)
    assert np.isfinite(pred_w).all()

    # full single-forward reference
    t_mel = batch["audio"].shape[-1] // 160 + 1
    step_fn = pipe._get_eval_step(num_frames, t_mel)
    _, full = step_fn(pipe.state, pipe._device_batch(batch),
                      jax.random.PRNGKey(0), None)
    pred_f = np.asarray(full["poses_pred_batch"][0])

    # same scale and strong agreement away from window seams: compare medians of
    # the per-frame deviation against the overall signal magnitude
    denom = np.abs(pred_f).mean() + 1e-6
    rel = np.abs(pred_w - pred_f).mean(axis=(1, 2)) / denom
    assert np.median(rel) < 0.5, float(np.median(rel))