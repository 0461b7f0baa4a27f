"""Streaming wav->pose sessions (utils/streaming.py): offline equivalence,
chunk-size invariance, short/tail/grid-aligned stream shapes."""

import numpy as np
import pytest

from speechdrivestemplates_tpu.ops.longform import (SAMPLES_PER_FRAME,
                                                    stitch_windows,
                                                    window_audio)
from speechdrivestemplates_tpu.utils.audio import parse_audio_length
from speechdrivestemplates_tpu.utils.streaming import StreamingPoseSession

K = 5  # keypoints for the fake forward


def fake_forward(audio_win):
    """Deterministic (1, L) -> (1, 64, 2, K): per-frame stats of the window.

    Depends on the WHOLE window (cumulative sum) so any window-boundary
    mistake in the session changes the output."""
    a = np.asarray(audio_win)[0]
    spf = int(SAMPLES_PER_FRAME)
    frames = a[: 64 * spf].reshape(64, spf)
    base = np.stack([frames.mean(1), frames.std(1)], axis=1)  # (64, 2)
    glob = np.cumsum(frames.sum(1))[:, None] * 1e-3            # global coupling
    out = (base + glob)[:, :, None] * (1.0 + np.arange(K))
    return out[None].astype(np.float32)


def offline_reference(audio):
    _, nf = parse_audio_length(len(audio), 16000, 15)
    windows, plan = window_audio(audio, nf, 64, 16)
    poses = np.concatenate([fake_forward(w[None]) for w in windows])
    return stitch_windows(poses, plan, nf, 16)


def stream(audio, chunk):
    sess = StreamingPoseSession(fake_forward, 64, 16)
    got = []
    for i in range(0, len(audio), chunk):
        got.append(sess.feed(audio[i: i + chunk]))
    got.append(sess.flush())
    return np.concatenate([g for g in got if g.size])


@pytest.mark.parametrize("nf", [64,   # exactly one window
                                128,  # regular grid, no tail
                                100,  # tail window reaches back over a seam
                                40])  # shorter than one window (zero-pad)
def test_stream_matches_offline(nf, rng):
    total = int(nf * SAMPLES_PER_FRAME) + 300  # un-snapped, like a raw wav
    audio = (rng.randn(total) * 0.1).astype(np.float32)
    want = offline_reference(audio)
    got = stream(audio, chunk=16000)
    assert got.shape == want.shape == (parse_audio_length(total, 16000, 15)[1],
                                       2, K)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_chunk_size_invariance(rng):
    audio = (rng.randn(int(150 * SAMPLES_PER_FRAME)) * 0.1).astype(np.float32)
    ref = stream(audio, chunk=len(audio))  # everything in one feed
    for chunk in (777, 16000, 68266):
        np.testing.assert_array_equal(stream(audio, chunk), ref)


def test_incremental_emission(rng):
    """Frames arrive with bounded latency: after each window's audio is in,
    one more stride (minus the seam guard) becomes final."""
    sess = StreamingPoseSession(fake_forward, 64, 16)
    spf = SAMPLES_PER_FRAME
    audio = (rng.randn(int(200 * spf)) * 0.1).astype(np.float32)

    # first window needs 64 frames of audio; nothing before that
    out = sess.feed(audio[: int(50 * spf)])
    assert out.shape[0] == 0 and sess.frames_emitted == 0
    out = sess.feed(audio[int(50 * spf): int(70 * spf)])
    assert sess.frames_emitted == 1  # window 0 ran; frames <= its start final
    out = sess.feed(audio[int(70 * spf): int(110 * spf)])
    assert sess.frames_emitted == 33  # window 1 (start 32) ran
    tail = sess.flush()
    total_frames = parse_audio_length(len(audio[: int(110 * spf)])
                                      + 0, 16000, 15)[1]  # only fed 110 frames
    assert sess.frames_emitted == total_frames
    assert tail.shape[0] == total_frames - 33


def test_flush_empty_and_double_flush():
    sess = StreamingPoseSession(fake_forward, 64, 16)
    out = sess.flush()
    assert out.shape[0] == 0
    with pytest.raises(AssertionError):
        sess.flush()


@pytest.mark.slow
def test_stream_with_real_generator(rng):
    """The session's forward contract is exactly what the AOT serving export
    produces: drive it with the real flagship generator via build_serving_fn
    and check streamed output equals the offline windowed pipeline."""
    import os

    import jax
    import jax.numpy as jnp

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.speakers_stat import get_speaker_stat  # noqa: F401
    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.utils.export import build_serving_fn

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.SPEAKER = "oliver"
    cfg.freeze()

    gen = build_model(cfg.VOICE2POSE.GENERATOR.NAME, cfg)
    win_samples = int(64 * SAMPLES_PER_FRAME)
    t_mel = win_samples // 160 + 1
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, t_mel)), 64,
                         jnp.zeros((1, 32)), False)

    fn, has_code = build_serving_fn(cfg, variables["params"],
                                    variables.get("batch_stats", {}))
    assert has_code
    code = jnp.asarray(rng.randn(1, 32).astype(np.float32))
    jfn = jax.jit(lambda a: fn(jnp.asarray(a), code))
    forward = lambda a: np.asarray(jfn(a))  # noqa: E731

    audio = (rng.randn(int(150 * SAMPLES_PER_FRAME)) * 0.1).astype(np.float32)
    _, nf = parse_audio_length(len(audio), 16000, 15)
    windows, plan = window_audio(audio, nf, 64, 16)
    offline = stitch_windows(
        np.concatenate([forward(w[None]) for w in windows]), plan, nf, 16)

    sess = StreamingPoseSession(forward, 64, 16)
    got = [sess.feed(audio[i: i + 16000]) for i in range(0, len(audio), 16000)]
    got.append(sess.flush())
    streamed = np.concatenate([g for g in got if g.size])
    assert streamed.shape == offline.shape == (nf, 2, 121)
    np.testing.assert_allclose(streamed, offline, rtol=0, atol=1e-5)


def test_exact_boundary_length_matches_offline(rng):
    """total=102399 samples: raw sample arithmetic would deem window 1 (start
    32) ready (int(32*spf)+int(64*spf)=102399) while parse_audio_length gives
    95 frames, whose offline plan is [0, tail@31].  The session must follow
    the frame-derived plan (regression for the readiness criterion)."""
    audio = (rng.randn(102399) * 0.1).astype(np.float32)
    assert parse_audio_length(len(audio), 16000, 15)[1] == 95
    want = offline_reference(audio)
    got = stream(audio, chunk=16000)
    assert got.shape == want.shape == (95, 2, K)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_empty_returns_are_concatenatable():
    """Before any window runs, feed() returns (0, 2, num_keypoints) — callers
    can np.concatenate every return without filtering."""
    sess = StreamingPoseSession(fake_forward, 64, 16, num_keypoints=K)
    outs = [sess.feed(np.zeros(1000, np.float32)) for _ in range(3)]
    assert all(o.shape == (0, 2, K) for o in outs)
    audio = np.zeros(int(80 * SAMPLES_PER_FRAME), np.float32)
    outs.append(sess.feed(audio))
    outs.append(sess.flush())
    joined = np.concatenate(outs)
    assert joined.shape[0] == sess.frames_emitted
