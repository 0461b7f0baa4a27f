"""Headless debug plotters (utils/audio.py vis_waveform / vis_spectrogram)."""

import os

import numpy as np


def test_debug_plotters(tmp_path):
    from speechdrivestemplates_tpu.utils.audio import (vis_spectrogram,
                                                       vis_waveform)

    wav = np.sin(np.linspace(0, 100, 1600)).astype(np.float32)
    p1 = str(tmp_path / "wave.png")
    assert vis_waveform(wav, p1) is None and os.path.exists(p1)
    spec = np.abs(np.random.RandomState(0).randn(80, 100)).astype(np.float32)
    p2 = str(tmp_path / "spec.png")
    assert vis_spectrogram(spec, p2) is None and os.path.exists(p2)
    import matplotlib.pyplot as plt

    fig = vis_waveform(wav)
    assert fig is not None
    plt.close(fig)
