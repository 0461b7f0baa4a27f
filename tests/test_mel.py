"""Mel frontend golden tests.

torchaudio is unavailable, so the oracle is built from its documented composition:
torch.stft (center=True, reflect pad, periodic Hann padded to n_fft) -> |.|^2 ->
HTK-scale triangular filterbank (norm=None).  This is exactly
torchaudio.transforms.MelSpectrogram(win_length=400, hop_length=160, n_fft=512,
f_min=55, f_max=7500, n_mels=80) as instantiated by the reference
(core/pipelines/voice2pose.py:27-30)."""

import numpy as np
import pytest
import torch

from speechdrivestemplates_tpu.ops import mel as M


def torch_mel_oracle(audio_np: np.ndarray) -> np.ndarray:
    x = torch.from_numpy(audio_np)
    window = torch.hann_window(400, periodic=True)
    spec = torch.stft(x, n_fft=512, hop_length=160, win_length=400, window=window,
                      center=True, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    power = spec.real ** 2 + spec.imag ** 2  # (..., 257, T)
    fb = torch.from_numpy(M.mel_filterbank())  # (257, 80)
    mel = torch.matmul(power.transpose(-1, -2), fb).transpose(-1, -2)
    return mel.numpy()


def torchaudio_fb_oracle() -> np.ndarray:
    """torchaudio.functional.melscale_fbanks transcription (htk, norm=None)."""
    n_freqs, n_mels, sr, f_min, f_max = 257, 80, 16000, 55.0, 7500.0
    all_freqs = torch.linspace(0, sr // 2, n_freqs)
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    m_min, m_max = hz_to_mel(f_min), hz_to_mel(f_max)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    return torch.max(torch.zeros(1), torch.min(down_slopes, up_slopes)).numpy()


def test_filterbank_matches_torchaudio_formula():
    # ours computes the triangles in float64 then casts; torch works in float32 —
    # allow float32-rounding-level disagreement.
    np.testing.assert_allclose(M.mel_filterbank(), torchaudio_fb_oracle(),
                               rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("impl", ["rfft", "dft", "dft2"])
def test_mel_matches_torch_stft(impl, rng):
    audio = rng.randn(2, 16000).astype(np.float32) * 0.1
    ours = np.asarray(M.mel_spectrogram(audio, impl=impl))
    oracle = torch_mel_oracle(audio)
    assert ours.shape == oracle.shape == (2, 80, 16000 // 160 + 1)
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-4)


def test_mel_shape_for_reference_clip():
    """The reference 64-frame clip: 68266 samples -> 427 mel frames."""
    audio = np.zeros((1, 68266), dtype=np.float32)
    out = M.mel_spectrogram(audio)
    assert out.shape == (1, 80, 427)


def test_dft_equals_rfft(rng):
    audio = rng.randn(1, 8000).astype(np.float32)
    a = np.asarray(M.mel_spectrogram(audio, impl="rfft"))
    b = np.asarray(M.mel_spectrogram(audio, impl="dft"))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_dft2_trim_is_exact(rng):
    """dft2's frequency-bin trim drops only zero-weight filterbank rows, so it
    must agree with the untrimmed path to matmul round-off (on CPU, where
    Precision.HIGH is native fp32, the two are numerically equivalent)."""
    assert M._trimmed_bins(M.mel_filterbank()) == 256
    audio = rng.randn(2, 8000).astype(np.float32)
    a = np.asarray(M.mel_spectrogram(audio, impl="dft"))
    b = np.asarray(M.mel_spectrogram(audio, impl="dft2"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_sine_peak_location():
    """A 1 kHz tone must peak in the mel bin containing 1 kHz."""
    t = np.arange(16000) / 16000.0
    audio = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
    mel = np.asarray(M.mel_spectrogram(audio))[0].mean(-1)
    fb = M.mel_filterbank()
    freqs = np.linspace(0, 8000, 257)
    center = freqs[fb[:, mel.argmax()].argmax()]
    assert abs(center - 1000.0) < 120.0


def test_mel_conv_impl_rank_agnostic():
    """impl='conv' must honor the (..., L) contract like the other impls
    (regression: conv_general_dilated needs rank exactly 3)."""
    import jax.numpy as jnp
    import numpy as np

    from speechdrivestemplates_tpu.ops.mel import mel_spectrogram

    rng = np.random.RandomState(0)
    a1 = jnp.asarray(rng.randn(16000).astype(np.float32))
    a3 = jnp.asarray(rng.randn(2, 3, 16000).astype(np.float32))
    m1 = np.asarray(mel_spectrogram(a1, impl="conv"))
    m2 = np.asarray(mel_spectrogram(a1[None], impl="conv"))[0]
    np.testing.assert_allclose(m1, m2, rtol=1e-6, atol=1e-6)
    m3 = np.asarray(mel_spectrogram(a3, impl="conv"))
    assert m3.shape[:2] == (2, 3) and m3.shape[2] == 80
    m3_flat = np.asarray(mel_spectrogram(a3.reshape(6, 16000), impl="conv"))
    np.testing.assert_allclose(m3.reshape(6, *m3.shape[2:]), m3_flat,
                               rtol=1e-6, atol=1e-6)
