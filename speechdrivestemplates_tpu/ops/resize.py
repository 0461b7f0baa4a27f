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


# ---- length-polymorphic (valid-prefix) resizes -----------------------------------
#
# For demo length bucketing one executable serves every clip length in a bucket:
# the time axes carry a TRACED valid length, and the interpolation grid is built
# in-jit from that scalar.  The weight matrix keeps its static (out_len, in_len)
# shape — same MXU matmul as the static path — with rows/cols beyond the valid
# prefix zeroed, so the valid block is exactly the torch half-pixel grid of an
# unbucketed (in_valid -> out_valid) resize and everything else stays masked.


def _dynamic_resize_matrix(in_len: int, out_len: int, in_valid, out_valid,
                           dtype) -> jnp.ndarray:
    """(out_len, in_len) traced interpolation weights whose top-left
    (out_valid, in_valid) block equals ``_resize_matrix(in_valid, out_valid)``
    (up to fp32 grid arithmetic; the static path precomputes in fp64)."""
    i = jnp.arange(out_len, dtype=jnp.float32)
    j = jnp.arange(in_len, dtype=jnp.float32)
    iv = jnp.asarray(in_valid, jnp.float32)
    ov = jnp.asarray(out_valid, jnp.float32)
    # A deep downsample chain can drive a short clip's valid length to 0; the
    # (i < ov) row mask already zeroes such rows, but 0/0 in the ratio would be
    # NaN and 0 * NaN stays NaN — so compute the grid against clamped lengths.
    ratio = jnp.maximum(iv, 1.0) / jnp.maximum(ov, 1.0)
    src = jnp.clip((i + 0.5) * ratio - 0.5, 0.0, jnp.maximum(iv - 1.0, 0.0))
    W = jnp.clip(1.0 - jnp.abs(src[:, None] - j[None, :]), 0.0, 1.0)
    W = W * (i[:, None] < ov) * (j[None, :] < iv)
    return W.astype(dtype)


def interpolate_linear_time_valid(x: jnp.ndarray, out_len: int,
                                  in_valid, out_valid) -> jnp.ndarray:
    """Valid-prefix variant of :func:`interpolate_linear_time`: rows
    [0, out_valid) equal a static (in_valid -> out_valid) resize of the valid
    input prefix; rows beyond are zero."""
    W = _dynamic_resize_matrix(x.shape[-2], out_len, in_valid, out_valid, x.dtype)
    return jnp.einsum("ot,...tc->...oc", W, x, precision=_precision_for(x))


def interpolate_bilinear_valid(x: jnp.ndarray, out_hw: tuple[int, int],
                               in_w_valid, out_w_valid) -> jnp.ndarray:
    """Valid-prefix variant of :func:`interpolate_bilinear`: the H axis is fully
    valid (static grid); the W (time) axis uses the traced grid."""
    prec = _precision_for(x)
    Wh = jnp.asarray(_resize_matrix(x.shape[-3], out_hw[0]), dtype=x.dtype)
    Ww = _dynamic_resize_matrix(x.shape[-2], out_hw[1], in_w_valid, out_w_valid,
                                x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", Wh, x, precision=prec)
    return jnp.einsum("pw,...owc->...opc", Ww, x, precision=prec)


def mask_time(x: jnp.ndarray, t_valid, axis: int = -2) -> jnp.ndarray:
    """Zero positions >= t_valid (traced scalar) along ``axis``."""
    T = x.shape[axis]
    shape = [1] * x.ndim
    shape[axis] = T
    keep = (jnp.arange(T) < t_valid).reshape(shape)
    return x * keep.astype(x.dtype)


def conv_time_out_valid(v, k: int, s: int, p: int):
    """Output valid length of a stride-``s`` conv over a valid prefix of ``v``
    (torch L_out formula on the valid region; positions beyond are masked)."""
    return (v + 2 * p - k) // s + 1
