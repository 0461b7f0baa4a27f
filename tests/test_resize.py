"""jax.image.resize vs torch F.interpolate(align_corners=False) parity — the exact
convention the reference relies on (generator.py:41,70-85; autoencoder.py:60-66)."""

import numpy as np
import torch
import torch.nn.functional as F

from speechdrivestemplates_tpu.ops.resize import (
    interpolate_bilinear, interpolate_linear_time)


def test_linear_time_matches_torch(rng):
    x = rng.randn(2, 5, 7).astype(np.float32)  # (B, T, C)
    for out_len in [2, 3, 10, 64]:
        ours = np.asarray(interpolate_linear_time(x, out_len))
        # torch wants (B, C, T)
        xt = torch.from_numpy(x).permute(0, 2, 1)
        theirs = F.interpolate(xt, out_len, mode="linear", align_corners=False)
        theirs = theirs.permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_bilinear_matches_torch(rng):
    x = rng.randn(2, 5, 51, 3).astype(np.float32)  # (B, H, W, C)
    for out_hw in [(1, 64), (3, 7), (10, 100)]:
        ours = np.asarray(interpolate_bilinear(x, out_hw))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        theirs = F.interpolate(xt, out_hw, mode="bilinear", align_corners=False)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
