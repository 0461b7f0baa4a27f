"""Torch-exact linear/bilinear resize as matmuls.

The reference leans on ``F.interpolate(..., mode='linear'/'bilinear')`` with the
default ``align_corners=False`` and (crucially) **no antialiasing** in three places:
the audio encoder's audio-rate -> video-rate resample (generator.py:41), the UNet
decoder's upsample-plus-skip (generator.py:70-85), and the VAE decoder
(autoencoder.py:60-66).  ``jax.image.resize`` anti-aliases when downsampling, which
diverges from torch on the audio encoder's (H=5 -> 1) squeeze, so instead each resize
is a precomputed interpolation matrix applied with a matmul:

    out[..., i, c] = sum_j W[i, j] * x[..., j, c],   W has <= 2 taps per row,
    W[i, .] from src = clamp((i + 0.5) * in/out - 0.5, 0, in-1), lerp of floor/ceil.

Dense W is tiny here (time axes <= a few hundred), the contraction lands on the MXU,
and the result is bit-comparable to torch's half-pixel sampling for both up- and
down-sampling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_len: int, out_len: int) -> np.ndarray:
    """(out_len, in_len) torch align_corners=False linear interpolation weights."""
    if in_len == out_len:
        return np.eye(in_len, dtype=np.float32)
    scale = in_len / out_len
    src = (np.arange(out_len, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_len - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_len - 1)
    w1 = (src - i0).astype(np.float64)
    W = np.zeros((out_len, in_len), dtype=np.float64)
    rows = np.arange(out_len)
    np.add.at(W, (rows, i0), 1.0 - w1)
    np.add.at(W, (rows, i1), w1)
    return W.astype(np.float32)


# Interpolation weights are exact fp32 lerp coefficients.  In fp32 compute the
# contractions run at HIGHEST precision so TPU bf16 matmul defaults don't
# perturb skip connections (forward-parity requirement).  When the activations
# are ALREADY bf16 (TRAIN.PRECISION=bf16) the inputs carry bf16 error anyway,
# so a 3-pass bf16x3 matmul buys nothing — use the MXU's native pass instead.
def _precision_for(x: jnp.ndarray):
    return (None if x.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST)


def interpolate_linear_time(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Resize the time axis of a (..., T, C) tensor to ``out_len``
    (torch 'linear', align_corners=False, antialias=False)."""
    W = jnp.asarray(_resize_matrix(x.shape[-2], out_len), dtype=x.dtype)
    return jnp.einsum("ot,...tc->...oc", W, x, precision=_precision_for(x))


def interpolate_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Resize the (H, W) axes of a (..., H, W, C) tensor
    (torch 'bilinear', align_corners=False, antialias=False) — separable."""
    prec = _precision_for(x)
    Wh = jnp.asarray(_resize_matrix(x.shape[-3], out_hw[0]), dtype=x.dtype)
    Ww = jnp.asarray(_resize_matrix(x.shape[-2], out_hw[1]), dtype=x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", Wh, x, precision=prec)
    return jnp.einsum("pw,...owc->...opc", Ww, x, precision=prec)
