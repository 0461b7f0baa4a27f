"""Pallas mel kernel parity (interpret mode on CPU; compiled path exercised on TPU
by bench/production configs with SYS.MEL_IMPL='pallas')."""

import numpy as np
import pytest


@pytest.mark.slow
def test_pallas_matches_dft_interpret(rng):
    import jax.numpy as jnp

    from speechdrivestemplates_tpu.ops.mel import mel_spectrogram
    from speechdrivestemplates_tpu.ops.mel_pallas import mel_spectrogram_pallas

    audio = rng.randn(1, 16000).astype(np.float32) * 0.1
    ref = np.asarray(mel_spectrogram(jnp.asarray(audio), impl="dft"))
    pal = np.asarray(mel_spectrogram_pallas(jnp.asarray(audio), interpret=True))
    assert pal.shape == ref.shape
    np.testing.assert_allclose(pal, ref, rtol=1e-3, atol=1e-4)


def test_conv_impl_matches_dft(rng):
    import jax.numpy as jnp

    from speechdrivestemplates_tpu.ops.mel import mel_spectrogram

    audio = rng.randn(1, 16000).astype(np.float32) * 0.1
    ref = np.asarray(mel_spectrogram(jnp.asarray(audio), impl="dft"))
    conv = np.asarray(mel_spectrogram(jnp.asarray(audio), impl="conv"))
    np.testing.assert_allclose(conv, ref, rtol=1e-3, atol=1e-5)
