"""Long-form (windowed) inference: arbitrary-length audio on a fixed-shape graph.

The reference handles long demo audio with one dynamic-length forward
(F.interpolate(..., num_frames), generator.py:41) and caps input at 24 s
(MAX_DEMO_LENGTH).  On TPU a dynamic length means one compile per length; worse, a
single huge forward cannot scale past one chip.  This module slices the waveform
into fixed-size overlapping windows, runs them as EXTRA BATCH entries through the
already data-parallel forward (so a mesh of N chips processes N windows
concurrently with zero new parallel machinery), then crops the halo and linearly
cross-fades the seams.

The generator is fully convolutional with a bounded receptive field, so with a halo
larger than that field the stitched interior matches the single-forward result
closely; seams are hidden by the crossfade.  One compiled executable serves every
audio length.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

AUDIO_SR = 16000  # reference audio sample rate (gesture_dataset.py:61)
VIDEO_FPS = 15    # reference video frame rate
SAMPLES_PER_FRAME = AUDIO_SR / VIDEO_FPS


def plan_windows(num_frames: int, window_frames: int = 64,
                 halo_frames: int = 16) -> list:
    """Window starts (in frames) so consecutive windows overlap by 2*halo and the
    whole [0, num_frames) range is covered.  Returns [(start, size), ...]."""
    assert window_frames > 2 * halo_frames, "window must exceed its two halos"
    stride = window_frames - 2 * halo_frames
    starts = list(range(0, max(num_frames - window_frames, 0) + 1, stride))
    if not starts:
        starts = [0]
    if starts[-1] + window_frames < num_frames:
        starts.append(num_frames - window_frames)
    return [(s, window_frames) for s in starts]


def window_audio(audio: np.ndarray, num_frames: int, window_frames: int = 64,
                 halo_frames: int = 16) -> Tuple[np.ndarray, list]:
    """Slice a waveform into fixed-length overlapping windows.

    audio: (L,) with L snapped to num_frames (parse_audio_length).
    Returns (windows (N, L_w) float32, plan) with L_w = window_frames frames of
    audio; short inputs are zero-padded to one full window.
    """
    plan = plan_windows(num_frames, window_frames, halo_frames)
    l_w = int(window_frames * SAMPLES_PER_FRAME)
    out = np.zeros((len(plan), l_w), dtype=np.float32)
    for i, (start, _) in enumerate(plan):
        a0 = int(start * SAMPLES_PER_FRAME)
        seg = audio[a0: a0 + l_w]
        out[i, : len(seg)] = seg
    return out, plan


def crossfade_ramp(window_frames: int, halo_frames: int) -> np.ndarray:
    """Per-window blend weights: linear fades over each halo, floored so
    weights never vanish.  Shared by the offline stitcher and the streaming
    session (utils/streaming.py) — their bit-identical-output contract depends
    on both using literally this ramp."""
    ramp = np.ones(window_frames)
    if halo_frames > 0:
        fade_in = np.linspace(0.0, 1.0, halo_frames, endpoint=False)
        ramp[:halo_frames] = fade_in
        ramp[-halo_frames:] = fade_in[::-1]
    return np.maximum(ramp, 1e-3)


def stitch_windows(poses: np.ndarray, plan: list, num_frames: int,
                   halo_frames: int = 16) -> np.ndarray:
    """Blend per-window pose predictions back into one sequence.

    poses: (N, window_frames, 2, K).  Overlapping regions are linearly
    cross-faded; window edges (which saw zero-padded or truncated context) only
    ever contribute inside another window's confident interior.
    """
    n, w = poses.shape[0], poses.shape[1]
    out = np.zeros((num_frames,) + poses.shape[2:], dtype=np.float64)
    weight = np.zeros((num_frames, 1, 1), dtype=np.float64)

    # applied unconditionally (also when n == 1): weight normalization cancels
    # the ramp wherever only one window contributes, so the output is
    # unchanged — and the streaming session, which cannot know n in advance,
    # stays bit-identical
    ramp = crossfade_ramp(w, halo_frames)

    for i, (start, size) in enumerate(plan):
        stop = min(start + size, num_frames)
        k = stop - start
        out[start:stop] += poses[i, :k] * ramp[:k, None, None]
        weight[start:stop] += ramp[:k, None, None]
    return (out / weight).astype(np.float32)
