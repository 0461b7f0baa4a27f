"""Streaming wav->pose inference: feed audio chunks, receive pose frames.

The reference's demo path is strictly offline — it loads a whole wav, runs one
dynamic-length forward, and writes a video (reference trainer.py:459-484).
This module adds the live-serving counterpart: a session object that accepts
arbitrarily-sized audio chunks as they arrive (microphone, RTP, websocket...)
and emits finalized pose frames with bounded latency.

Mechanics: the generator is fully convolutional but non-causal (UNet over the
whole window + global InstanceNorm statistics), so exact streaming is
impossible; instead the stream is sliced into the same fixed-shape overlapping
windows as the offline long-form path (``ops/longform.py``) and blended with
the identical crossfade arithmetic — a fully-streamed session produces
BIT-IDENTICAL output to the offline windowed demo on the same audio (tested).
A window runs as soon as its audio is buffered, so the worst-case latency is
one window (default 64 frames = ~4.3 s) and the steady-state emission cadence
is one stride (window - 2*halo = 32 frames = ~2.1 s) per forward.  A batch-1
window forward measures 1.7 ms on a v5e chip (~2,500x realtime per stream);
multiplexing concurrent streams through the batch-128 serving configuration
(9.4 ms / 128 windows) supports ~29,000 simultaneous streams per chip.

The ``forward_fn`` contract is one fixed shape ``(1, window_samples) f32 ->
(1, window_frames, 2, K)``: exactly what ``utils/export.py`` serializes, so a
session can run directly off an AOT artifact with zero framework imports:

    fn = load_serving_fn("sdt_bp_stream.stablehlo")
    sess = StreamingPoseSession(lambda a: fn(a, code))
    for chunk in audio_source:
        for frame in sess.feed(chunk): ...
    tail = sess.flush()
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from ..ops.longform import SAMPLES_PER_FRAME


class StreamingPoseSession:
    """Incremental windowed wav->pose with offline-identical crossfade.

    forward_fn: ``(1, window_samples) float32 -> (1, window_frames, 2, K)``
    (poses in whatever space the function produces — normalized or pixel).
    """

    def __init__(self, forward_fn: Callable, window_frames: int = 64,
                 halo_frames: int = 16, num_keypoints: int = 121):
        assert window_frames > 2 * halo_frames, "window must exceed its halos"
        self.forward_fn = forward_fn
        self.window_frames = window_frames
        self.halo_frames = halo_frames
        self.stride = window_frames - 2 * halo_frames
        self.window_samples = int(window_frames * SAMPLES_PER_FRAME)
        # shapes empty returns before the first forward ran; corrected to the
        # forward's actual K afterwards
        self._num_kp = num_keypoints

        # the ONE ramp both paths share (ops/longform.crossfade_ramp) — the
        # bit-identical-to-offline contract depends on it
        from ..ops.longform import crossfade_ramp

        self._ramp = crossfade_ramp(window_frames, halo_frames)[:, None, None]

        self._audio = np.zeros((0,), np.float32)   # un-consumed tail of the stream
        self._consumed = 0                          # samples dropped off the left
        self._next_window = 0                       # next regular window index
        self._acc: Optional[np.ndarray] = None      # weighted pose sums
        self._wgt: Optional[np.ndarray] = None      # matching weights
        self._acc_start = 0                         # frame index of _acc[0]
        self._emitted = 0                           # frames already returned
        self._finished = False

    # -- internals -------------------------------------------------------------

    def _window_bounds(self, start_frame: int):
        a0 = int(start_frame * SAMPLES_PER_FRAME)
        return a0, a0 + self.window_samples

    def _frames_received(self) -> int:
        """Frame count of the audio received so far — the SAME derivation the
        offline demo dataset uses (parse_audio_length), so the set of windows
        the session runs always equals ops/longform.plan_windows' plan for
        this much audio.  Deriving readiness from raw sample arithmetic
        instead would diverge at exact boundary lengths (int(W*spf) rounds
        below W*spf) and break the offline-identical contract."""
        from ..ops.longform import AUDIO_SR, VIDEO_FPS
        from .audio import parse_audio_length

        # sr/fps MUST be the constants SAMPLES_PER_FRAME (and therefore
        # window_samples) is derived from, or readiness and window bounds
        # silently disagree
        return parse_audio_length(self._consumed + len(self._audio),
                                  AUDIO_SR, VIDEO_FPS)[1]

    def _run_window(self, start_frame: int, audio_win: np.ndarray):
        poses = np.asarray(self.forward_fn(audio_win[None]))[0]
        assert poses.shape[0] == self.window_frames, poses.shape
        self._num_kp = poses.shape[-1]
        if self._acc is None:
            k = poses.shape[-1]
            self._acc = np.zeros((0, 2, k), np.float64)
            self._wgt = np.zeros((0, 1, 1), np.float64)
            self._acc_start = start_frame
        end = start_frame + self.window_frames
        have = self._acc_start + self._acc.shape[0]
        if end > have:
            grow = end - have
            self._acc = np.concatenate(
                [self._acc, np.zeros((grow,) + self._acc.shape[1:])])
            self._wgt = np.concatenate(
                [self._wgt, np.zeros((grow, 1, 1))])
        lo = start_frame - self._acc_start
        self._acc[lo: lo + self.window_frames] += poses * self._ramp
        self._wgt[lo: lo + self.window_frames] += self._ramp

    def _empty(self) -> np.ndarray:
        return np.zeros((0, 2, self._num_kp), np.float32)

    def _emit_through(self, frame_end: int) -> np.ndarray:
        """Finalize and return frames [self._emitted, frame_end)."""
        if self._acc is None or frame_end <= self._emitted:
            return self._empty()
        lo = self._emitted - self._acc_start
        hi = frame_end - self._acc_start
        out = (self._acc[lo:hi] / self._wgt[lo:hi]).astype(np.float32)
        # drop finalized frames so the buffers stay O(window)
        self._acc = self._acc[hi:]
        self._wgt = self._wgt[hi:]
        self._acc_start = frame_end
        self._emitted = frame_end
        return out

    # -- public API ------------------------------------------------------------

    @property
    def frames_emitted(self) -> int:
        return self._emitted

    def feed(self, chunk: np.ndarray) -> np.ndarray:
        """Append audio samples; returns newly FINALIZED pose frames
        (possibly empty).  A frame is final once no future window can
        contribute to it."""
        assert not self._finished, "session already flushed"
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        self._audio = np.concatenate([self._audio, chunk])

        emitted: List[np.ndarray] = []
        while True:
            start = self._next_window * self.stride
            # readiness in FRAMES (the offline plan's criterion: a regular
            # window exists iff start + window <= num_frames), not samples
            if start + self.window_frames > self._frames_received():
                break  # not enough audio buffered yet
            a0, a1 = self._window_bounds(start)
            win = self._audio[a0 - self._consumed: a1 - self._consumed]
            self._run_window(start, win)
            self._next_window += 1
            # Conservative finalization: a flush() can arrive at any moment,
            # and its end-aligned tail window starts anywhere AFTER this
            # window's start — so only frames <= start are beyond the reach of
            # every possible future window (regular windows start later too).
            emitted.append(self._emit_through(start + 1))
            # keep only audio a future window (earliest possible start:
            # start + 1) could still need
            keep_from, _ = self._window_bounds(start + 1)
            drop = keep_from - self._consumed
            if drop > 0:
                self._audio = self._audio[drop:]
                self._consumed = keep_from
        if not emitted:
            return self._empty()
        return np.concatenate(emitted)

    def flush(self) -> np.ndarray:
        """End of stream: run the tail window (zero-padded for short streams,
        end-aligned otherwise — matching ops/longform.plan_windows) and return
        every remaining frame."""
        assert not self._finished, "session already flushed"
        self._finished = True
        num_frames = self._frames_received()
        if num_frames <= 0:
            return self._empty()

        covered = ((self._next_window - 1) * self.stride + self.window_frames
                   if self._next_window > 0 else 0)
        if covered < num_frames:
            # end-aligned tail window (zero-padded when the stream is shorter
            # than one window)
            start = max(num_frames - self.window_frames, 0)
            a0, _ = self._window_bounds(start)
            win = np.zeros((self.window_samples,), np.float32)
            seg = self._audio[max(a0 - self._consumed, 0):][: self.window_samples]
            win[: len(seg)] = seg
            self._run_window(start, win)
        return self._emit_through(num_frames)
