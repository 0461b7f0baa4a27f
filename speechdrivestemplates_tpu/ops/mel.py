"""Mel-spectrogram frontend, numerically compatible with torchaudio's
``MelSpectrogram(win_length=400, hop_length=160, n_fft=512, f_min=55, f_max=7500,
n_mels=80)`` as used by the reference (``core/pipelines/voice2pose.py:27-30``):
periodic Hann window (zero-padded symmetrically to n_fft), center=True with reflect
padding, power-2 spectrogram, HTK mel scale, no filterbank normalization.

Device paths behind one signature:
  - ``impl='rfft'``  — jnp.fft.rfft reference path (used for parity tests).
  - ``impl='dft'``   — framing + two real-DFT matmuls + mel matmul at fp32-exact
    precision (HIGHEST).  On TPU this puts all the FLOPs on the MXU (128x128 systolic
    array) instead of the FFT's scalar-ish butterfly network, and XLA fuses the window
    multiply and |.|^2 elementwise ops into the matmul epilogues.
  - ``impl='dft2'``  — the serving-tuned variant (measured fastest on v5e at every
    batch size): the cos and sin DFT matrices are CONCATENATED and TRIMMED to the
    frequency bins the mel filterbank actually touches (bins 2..239 for the
    reference's f_max=7500 < Nyquist), giving one zero-padding-waste (512, 512) MXU
    pass, run at ``Precision.HIGH`` (bf16x3 operand splitting inside the fused
    matmul — no extra HBM traffic, ~2e-5 relative error end to end).  Exact in the
    trim: the dropped bins have identically-zero filter weight.

The fused single-kernel Pallas version lives in ``mel_pallas.py`` and is dispatched by
``mel_spectrogram(impl='pallas')``; it keeps the frame matrix out of HBM entirely but
its in-VMEM granule shuffle is VPU-bound, so on v5e the dft2 matmul path wins
(0.59 ms vs 2.8 ms for batch-128 x 4.27 s clips; see docs/STATUS_r2.md).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

N_FFT = 512
WIN_LENGTH = 400
HOP_LENGTH = 160
N_MELS = 80
F_MIN = 55.0
F_MAX = 7500.0
SAMPLE_RATE = 16000


def _hz_to_mel(f):
    """HTK mel scale (torchaudio mel_scale='htk')."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def _mel_filterbank_np(sr: int, n_fft: int, n_mels: int, f_min: float, f_max: float):
    """Triangular mel filterbank, (n_freqs, n_mels), torchaudio melscale_fbanks
    semantics (norm=None, htk scale)."""
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    m_min, m_max = _hz_to_mel(f_min), _hz_to_mel(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


def mel_filterbank(sr: int = SAMPLE_RATE, n_fft: int = N_FFT, n_mels: int = N_MELS,
                   f_min: float = F_MIN, f_max: float = F_MAX) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank."""
    return _mel_filterbank_np(sr, n_fft, n_mels, f_min, f_max)


@functools.lru_cache(maxsize=8)
def _window_np(win_length: int, n_fft: int):
    """Periodic Hann of win_length, zero-padded symmetrically to n_fft
    (torch.stft pads the window with (n_fft - win_length) // 2 on the left)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float32)
    out[left:left + win_length] = w.astype(np.float32)
    return out


@functools.lru_cache(maxsize=4)
def _dft_matrices_np(n_fft: int):
    """Real-input DFT as two matmuls: frames @ C -> Re, frames @ S -> -Im.
    C, S: (n_fft, n_freqs)."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _frame_signal(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Reflect-pad by n_fft//2 (center=True) and slice into overlapping frames.

    audio: (..., L) -> frames (..., T, n_fft) with T = L // hop + 1.
    Static shapes only; the gather index matrix is a compile-time constant.
    """
    pad = n_fft // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    length = audio.shape[-1]
    num_frames = length // hop + 1
    idx = (np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :])
    return x[..., idx]


def mel_spectrogram(audio: jnp.ndarray,
                    sr: int = SAMPLE_RATE,
                    n_fft: int = N_FFT,
                    win_length: int = WIN_LENGTH,
                    hop_length: int = HOP_LENGTH,
                    n_mels: int = N_MELS,
                    f_min: float = F_MIN,
                    f_max: float = F_MAX,
                    impl: str = "dft") -> jnp.ndarray:
    """Power mel spectrogram of a waveform batch.

    audio: (..., L) float32 -> (..., n_mels, T) float32 with T = L // hop_length + 1,
    matching torchaudio.transforms.MelSpectrogram with the reference's parameters.
    """
    if impl == "auto":
        # trimmed combined-DFT matmul at bf16x3 on TPU; fp32 DFT-matmul elsewhere
        impl = "dft2" if jax.default_backend() not in ("cpu", "gpu") else "dft"
    if impl == "pallas":
        from .mel_pallas import mel_spectrogram_pallas

        return mel_spectrogram_pallas(audio, sr=sr, n_fft=n_fft, win_length=win_length,
                                      hop_length=hop_length, n_mels=n_mels,
                                      f_min=f_min, f_max=f_max)
    if impl == "conv":
        return _mel_conv(audio, sr, n_fft, win_length, hop_length, n_mels,
                         f_min, f_max)

    window = jnp.asarray(_window_np(win_length, n_fft))
    fb_np = _mel_filterbank_np(sr, n_fft, n_mels, f_min, f_max)
    frames = _frame_signal(audio, n_fft, hop_length) * window  # (..., T, n_fft)

    # fp32 MXU passes: bf16 default matmul precision is too coarse for a power
    # spectrum that then feeds log-scale-ish mel energies.
    hi = jax.lax.Precision.HIGHEST
    if impl == "rfft":
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    elif impl == "dft":
        cos_m, sin_m = _dft_matrices_np(n_fft)
        re = jnp.matmul(frames, jnp.asarray(cos_m), precision=hi)
        im = jnp.matmul(frames, jnp.asarray(sin_m), precision=hi)
        power = re * re + im * im
    elif impl == "dft2":
        k_used = _trimmed_bins(fb_np)  # exact: dropped bins have zero mel weight
        cos_m, sin_m = _dft_matrices_np(n_fft)
        cs = jnp.asarray(np.concatenate(
            [cos_m[:, :k_used], sin_m[:, :k_used]], axis=1))
        p = jax.lax.Precision.HIGH  # bf16x3 operand split inside the fused matmul
        reim = jnp.matmul(frames, cs, precision=p)
        power = reim[..., :k_used] ** 2 + reim[..., k_used:] ** 2
        mel = jnp.matmul(power, jnp.asarray(fb_np[:k_used]), precision=p)
        return jnp.swapaxes(mel, -1, -2)
    else:
        raise ValueError(f"unknown mel impl: {impl}")

    mel = jnp.matmul(power, jnp.asarray(fb_np), precision=hi)  # (..., T, n_mels)
    return jnp.swapaxes(mel, -1, -2)  # (..., n_mels, T)


def _trimmed_bins(fb_np: np.ndarray) -> int:
    """Smallest 128-multiple (for exact MXU lane tiling) covering every frequency
    bin with nonzero mel filter weight; falls back to the full bin count when the
    filterbank reaches Nyquist."""
    support = int(np.flatnonzero(fb_np.any(axis=1)).max()) + 1
    k = -(-support // 128) * 128
    return min(k, fb_np.shape[0])


def _mel_conv(audio: jnp.ndarray, sr, n_fft, win_length, hop_length, n_mels,
              f_min, f_max) -> jnp.ndarray:
    """STFT as a strided convolution: the windowed DFT basis becomes a filter bank
    conv1d(audio, win*[cos|sin], stride=hop).  XLA lowers this to an implicit-GEMM
    on the MXU without materializing the (B, T, n_fft) frame matrix in HBM — the
    TPU-native formulation of framing."""
    hi = jax.lax.Precision.HIGHEST
    window = _window_np(win_length, n_fft)
    cos_m, sin_m = _dft_matrices_np(n_fft)
    n_freq = n_fft // 2 + 1
    # filters: (n_fft taps, in=1, out=2*n_freq) -> one conv for re and im together
    filt = np.concatenate([cos_m * window[:, None], sin_m * window[:, None]],
                          axis=1)[:, None, :]
    pad = n_fft // 2
    lead = audio.shape[:-1]  # conv_general_dilated needs rank exactly 3 (NWC)
    x = audio.reshape((-1, audio.shape[-1]))
    x = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    out = jax.lax.conv_general_dilated(
        x[..., None], jnp.asarray(filt), window_strides=(hop_length,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"), precision=hi)
    re, im = out[..., :n_freq], out[..., n_freq:]
    power = re * re + im * im  # (B, T, n_freq)
    fb = jnp.asarray(_mel_filterbank_np(sr, n_fft, n_mels, f_min, f_max))
    mel = jnp.matmul(power, fb, precision=hi)
    mel = jnp.swapaxes(mel, -1, -2)
    return mel.reshape(lead + mel.shape[1:])


def mel_frames_for_audio_length(audio_length: int, hop_length: int = HOP_LENGTH) -> int:
    """Number of mel frames produced for a given (already snapped) audio length."""
    return audio_length // hop_length + 1
