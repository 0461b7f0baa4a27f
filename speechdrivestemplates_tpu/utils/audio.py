"""Audio length bookkeeping and host-side wav I/O.

Behavioral parity with the reference's ``core/utils/audio_processing.py:5-19``
(parse_audio_length / crop_pad_audio) and the demo-path librosa load at
``core/datasets/gesture_dataset.py:61-69`` (librosa is unavailable here; wav loading is
implemented with the stdlib + scipy and resampled with a polyphase filter).
"""

from __future__ import annotations

import numpy as np


def parse_audio_length(audio_length: int, sr: int, fps: int) -> tuple[int, int]:
    """Snap an audio length to an integer number of video frames.

    Matches reference ``audio_processing.py:5-11``: ``bit_per_frames = sr / fps`` (float
    division), ``num_frames = int(audio_length / bit_per_frames)``,
    ``audio_length = int(num_frames * bit_per_frames)``.
    """
    bit_per_frames = sr / fps
    num_frames = int(audio_length / bit_per_frames)
    audio_length = int(num_frames * bit_per_frames)
    return audio_length, num_frames


def crop_pad_audio(wav: np.ndarray, audio_length: int) -> np.ndarray:
    """Crop or zero-pad a 1-D waveform to exactly ``audio_length`` samples
    (reference ``audio_processing.py:14-19``)."""
    if len(wav) > audio_length:
        wav = wav[:audio_length]
    elif len(wav) < audio_length:
        wav = np.pad(wav, [0, audio_length - len(wav)], mode="constant", constant_values=0)
    return wav


def load_wav(path: str, target_sr: int = 16000) -> np.ndarray:
    """Load an audio file as mono float32 at ``target_sr`` (librosa.load equivalent).

    .wav loads via scipy; other containers (m4a etc., reference
    gesture_dataset.py:64 supports them through librosa/ffmpeg) are decoded with the
    ffmpeg binary when present.  Resampling uses scipy's polyphase filter, which is
    numerically close to librosa's default resampler for speech.
    """
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    if not path.lower().endswith(".wav"):
        return _load_via_ffmpeg(path, target_sr)
    sr, data = wavfile.read(path)
    data = np.asarray(data)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:  # (num_samples, channels) -> mono
        data = data.mean(axis=1)
    if sr != target_sr:
        g = np.gcd(int(sr), int(target_sr))
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    return np.ascontiguousarray(data, dtype=np.float32)


def _load_via_ffmpeg(path: str, target_sr: int) -> np.ndarray:
    """Decode any ffmpeg-supported container to mono float32 PCM at target_sr."""
    import shutil
    import subprocess

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise NotImplementedError(
            f"non-wav audio ({path}) needs the ffmpeg binary, which is not on PATH")
    out = subprocess.run(
        [ffmpeg, "-i", path, "-f", "f32le", "-ac", "1", "-ar", str(target_sr),
         "pipe:1"],
        check=True, capture_output=True)
    return np.frombuffer(out.stdout, dtype=np.float32).copy()


def vis_waveform(wav, out_path: str | None = None):
    """Debug plot of a waveform (reference ``audio_processing.py:21-25``
    shows it interactively; this headless variant saves/returns the figure)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    wav = np.asarray(wav)
    print(f"Shape of waveform: {wav.shape}")
    fig = plt.figure()
    plt.plot(wav)
    if out_path is not None:
        fig.savefig(out_path)
        plt.close(fig)
        return None
    return fig


def vis_spectrogram(specgram, out_path: str | None = None):
    """Debug plot of a (mel) spectrogram in log2 scale (reference
    ``audio_processing.py:27-31``, headless)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    specgram = np.asarray(specgram)
    print(f"Shape of spectrogram: {specgram.shape}")
    fig = plt.figure()
    plt.imshow(np.log2(np.maximum(specgram, np.finfo(np.float32).tiny)),
               origin="lower", aspect="auto")
    if out_path is not None:
        fig.savefig(out_path)
        plt.close(fig)
        return None
    return fig
