"""Dense-demo length bucketing: few compiles for many clip lengths, exactly.

The reference's torch demo forward is shape-polymorphic (any audio length,
reference generator.py:41, gesture_dataset.py:61-69); XLA specializes per
static shape, so an unbucketed dense path would compile once per distinct clip
length.  DEMO.LENGTH_BUCKET_S instead compiles a LENGTH-POLYMORPHIC executable
per 2 s bucket: the clip's true (t_mel, num_frames) are traced scalars, mel
columns beyond them are masked, IN statistics cover the valid prefix only, and
each time resize builds its half-pixel grid in-jit (still an MXU matmul).
5 distinct lengths must land in <= 3 executables with outputs equal to the
unbucketed forward to numerical precision (the only residue is the traced
grid's fp32 arithmetic vs the static path's fp64 precompute, ~1e-5 relative).
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipes(tmp_path_factory):
    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    tmp = tmp_path_factory.mktemp("bucketing")
    root = str(tmp / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=0)

    def build(bucket_s):
        cfg = get_cfg_defaults()
        cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                         "configs", "voice2pose_sdt_bp.yaml"))
        cfg.DATASET.ROOT_DIR = root
        cfg.DATASET.SPEAKER = "oliver"
        cfg.DATASET.MAX_DEMO_LENGTH = None
        cfg.DEMO.CODE_INDEX = 1  # deterministic code: both pipes, same forward
        cfg.DEMO.LENGTH_BUCKET_S = bucket_s
        cfg.TEST.SAVE_VIDEO = False
        cfg.TEST.SAVE_NPZ = False
        cfg.freeze()
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.num_train_samples = 4
        pipe.setup_model(cfg)
        return pipe

    bucketed = build(2.0)
    dense = build(0.0)
    dense.state = bucketed.state  # identical weights for the comparison
    return bucketed, dense, tmp


def _demo_batch(pipe, tmp, seconds, idx):
    from speechdrivestemplates_tpu.datasets.gesture_dataset import _collate
    from speechdrivestemplates_tpu.datasets.synthetic import make_demo_wav

    wav = make_demo_wav(str(tmp / f"clip_{idx}.wav"), seconds=seconds)
    pipe.setup_dataset(pipe.cfg, "demo", demo_input=wav)
    batch = next(iter(pipe.test_dataloader))
    if not isinstance(batch, dict):
        batch = _collate([batch])
    return batch


def test_five_lengths_three_executables(pipes):
    bucketed, dense, tmp = pipes
    lengths = [5.1, 6.9, 7.4, 8.8, 9.3]  # frames 76,103,111,132,139
    preds = {}
    for i, sec in enumerate(lengths):
        batch = _demo_batch(bucketed, tmp, sec, i)
        num_frames = int(np.asarray(batch["num_frames"]).reshape(-1)[0])
        res = bucketed._dense_demo_forward(batch, num_frames, None)
        pred = np.asarray(res["poses_pred_batch"])
        assert pred.shape == (1, num_frames, 2, 121), sec
        assert np.isfinite(pred).all()
        preds[sec] = (batch, num_frames, pred)

    eval_keys = [k for k in bucketed._jit_cache if k[0] == "eval"]
    assert len(eval_keys) <= 3, eval_keys  # 90/120/150-frame buckets

    # the bucketed output equals the unbucketed dense forward to numerical
    # precision (denormalized pose space spans O(100) px; measured max
    # deviation ~7e-4 px from the fp32 traced resize grid)
    batch, num_frames, pred = preds[6.9]
    res_ref = dense._dense_demo_forward(batch, num_frames, None)
    ref = np.asarray(res_ref["poses_pred_batch"])
    assert ref.shape == pred.shape
    np.testing.assert_allclose(pred, ref, atol=0.01)


def test_bucket_aligned_clip_is_untouched(pipes):
    bucketed, _, _ = pipes
    batch = {"audio": np.zeros((1, 96000), np.float32),
             "num_frames": np.int32(90)}
    out_batch, frames, valid = bucketed._bucket_demo_batch(batch, 90)
    assert frames == 90 and out_batch is batch
    assert valid == (np.int32(601), np.int32(90))  # 96000//160+1 mel frames


def test_dynamic_resize_matrix_matches_static():
    """The traced half-pixel grid equals the fp64-precomputed static matrix on
    the valid block and is zero outside it."""
    import jax.numpy as jnp
    from speechdrivestemplates_tpu.ops.resize import (_dynamic_resize_matrix,
                                                      _resize_matrix)

    for in_len, out_len, iv, ov in [(120, 150, 84, 103), (32, 16, 20, 11),
                                    (64, 64, 64, 64), (10, 40, 7, 29),
                                    (50, 25, 50, 25)]:
        W = np.asarray(_dynamic_resize_matrix(in_len, out_len,
                                              jnp.int32(iv), jnp.int32(ov),
                                              jnp.float32))
        ref = _resize_matrix(iv, ov)
        # fp32 grid arithmetic: src carries ~src*eps absolute error vs the
        # static path's fp64 precompute
        np.testing.assert_allclose(W[:ov, :iv], ref, atol=3e-5)
        assert not W[ov:].any() and not W[:, iv:].any()


def test_dynamic_resize_matrix_zero_valid_is_finite():
    """A deep downsample chain can collapse a short clip's valid length to 0;
    the grid must stay finite (all-masked), not NaN from the 0/0 ratio —
    regression for the bucketed-demo silent-NaN bug."""
    import jax.numpy as jnp
    from speechdrivestemplates_tpu.ops.resize import (
        _dynamic_resize_matrix, interpolate_linear_time_valid)

    for iv, ov in [(9, 0), (0, 0), (0, 5)]:
        W = np.asarray(_dynamic_resize_matrix(16, 32, jnp.int32(iv),
                                              jnp.int32(ov), jnp.float32))
        assert np.isfinite(W).all() and not W[ov:].any()
    x = np.ones((2, 16, 4), np.float32)
    y = np.asarray(interpolate_linear_time_valid(jnp.asarray(x), 32,
                                                 jnp.int32(0), jnp.int32(0)))
    assert np.isfinite(y).all() and not y.any()


def test_bucket_pads_frame_aligned(pipes):
    bucketed, _, _ = pipes
    from speechdrivestemplates_tpu.utils.audio import parse_audio_length

    audio_len, num_frames = parse_audio_length(81000, 16000, 15)
    rng = np.random.RandomState(0)
    audio = rng.randn(1, audio_len).astype(np.float32)
    batch = {"audio": audio.copy(), "num_frames": np.int32(num_frames)}
    out_batch, frames, valid = bucketed._bucket_demo_batch(batch, num_frames)
    assert frames == 90  # 75 -> next 30-frame bucket
    assert valid == (np.int32(audio_len // 160 + 1), np.int32(num_frames))
    got_len, got_frames = parse_audio_length(out_batch["audio"].shape[-1],
                                             16000, 15)
    assert got_frames == 90 and got_len == out_batch["audio"].shape[-1]
    assert int(np.asarray(out_batch["num_frames"]).reshape(-1)[0]) == 90
    # pad = 256-sample tail reflection (what the unbucketed mel's center
    # padding reads), then silence
    out = out_batch["audio"][0]
    np.testing.assert_array_equal(out[:audio_len], audio[0])
    np.testing.assert_array_equal(out[audio_len:audio_len + 256],
                                  audio[0, -2:-258:-1])
    assert not out[audio_len + 256:].any()
