"""Synthetic dataset fixture: fabricates a reference-layout speaker directory
(per-clip npz with 'pose'/'audio'/'imgs' + processed_137.csv) so train/test/demo run
end-to-end with no downloads.  Pose statistics match a registered speaker so the
z-scoring round-trips sanely (SURVEY.md §4's synthetic-fixture requirement)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def make_synthetic_speaker(root_dir: str, speaker: str = "oliver",
                           num_train: int = 12, num_dev: int = 4,
                           num_frames: int = 64, audio_length: int = 68267,
                           seed: int = 0, offset_scale: float = 1.0) -> str:
    """Create ``root_dir/<speaker>/`` with clips + csv; returns the speaker dir.

    ``offset_scale`` scales the per-clip random keypoint offsets (the
    memorization-hard component): 1.0 is the default fixture; small values
    (e.g. 0.2) make the task converge in tens of steps, which the
    convergence-parity test uses to reach a converged operating point within
    a CPU-tractable budget."""
    rng = np.random.RandomState(seed)
    speaker_dir = os.path.join(root_dir, speaker)
    os.makedirs(speaker_dir, exist_ok=True)

    rows = []
    for i in range(num_train + num_dev):
        split = "train" if i < num_train else "dev"
        # Plausible absolute 137-kp poses on a 1280x720 canvas: a torso anchored at
        # image center with smooth sinusoidal sway + noise; scores in (0.5, 1).
        t = np.arange(num_frames)[:, None]
        base_x = 640 + 40 * np.sin(2 * np.pi * t / 32 + rng.rand() * 6)
        base_y = 360 + 20 * np.cos(2 * np.pi * t / 24 + rng.rand() * 6)
        kx = (rng.rand(1, 137) * 300 - 150) * offset_scale
        ky = (rng.rand(1, 137) * 300 - 150) * offset_scale
        x = base_x + kx + rng.randn(num_frames, 137) * 2
        y = base_y + ky + rng.randn(num_frames, 137) * 2
        score = 0.5 + 0.5 * rng.rand(num_frames, 137)
        pose = np.stack([x, y, score], axis=1).astype(np.float32)  # (T, 3, 137)

        # Sine-sweep audio so the mel frontend sees structure.
        n = np.arange(audio_length)
        f0 = 80 + 400 * rng.rand()
        audio = (0.1 * np.sin(2 * np.pi * f0 * n / 16000 * (1 + n / audio_length))
                 ).astype(np.float32)

        fn = f"clip_{i:04d}.npz"
        np.savez(os.path.join(speaker_dir, fn), pose=pose, audio=audio,
                 imgs=np.array([], dtype=np.bytes_))
        rows.append({"dataset": split, "pose_fn": fn, "speaker": speaker,
                     "start": 0, "end": num_frames, "interval": f"i{i}",
                     "video_fn": "synthetic.mp4", "audio_fn": "synthetic.wav"})

    pd.DataFrame(rows).to_csv(os.path.join(speaker_dir, "processed_137.csv"),
                              index=False)
    return speaker_dir


def make_demo_wav(path: str, seconds: float = 4.27, sr: int = 16000,
                  seed: int = 0) -> str:
    """Write a small speech-like wav for the demo path."""
    from scipy.io import wavfile

    rng = np.random.RandomState(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    sig = sum(0.05 * np.sin(2 * np.pi * f * t + rng.rand() * 6)
              for f in (120, 240, 480, 950))
    sig = (sig * (0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * t) ** 2)).astype(np.float32)
    wavfile.write(path, sr, (sig * 32767).astype(np.int16))
    return path
