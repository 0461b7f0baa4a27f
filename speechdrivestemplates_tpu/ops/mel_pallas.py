"""Fused STFT+mel Pallas TPU kernel.

Replaces the reference's torchaudio MelSpectrogram (voice2pose.py:27-30) on the hot
path.  One kernel performs framing + Hann window + real-DFT (one combined MXU
matmul) + power + mel projection entirely in VMEM:

  HBM traffic: read audio once ((B, L) fp32), write mel once ((B, T, 80) fp32).
  The unfused path materializes the frame matrix (B, T, 512) in HBM — ~13x the
  audio bytes.

Framing under TPU tiling constraints (last dim must be 128-lane aligned):
hop=160 and n_fft=512 share gcd 32, so audio decomposes into logical 32-sample
"granules"; frame i is granules [5i, 5i+16).  Granules pack 4-per-VMEM-row in a
(rows, 128) layout, so granule g lives at [g//4, 32*(g%4) : 32*(g%4)+32].  Split
frames by class c = i % 4: for fixed (c, j) the j-th granule of every class-c frame
sits at a FIXED lane offset with row stride 5 — extractable with a static row slice,
a sublane-split reshape, and a static lane slice (all verified Mosaic-compilable).

Two shape tricks keep the MXU busy (they took the kernel from 3.5 ms to well under
the XLA DFT-matmul path at the batch-128 serving point):
  - FRAME_BLOCK = 512 frames per program: the DFT becomes one (512, 512) @ (512, 512)
    pass instead of four (128, 512) @ (512, 514)s, and the granule-shuffle slices
    operate on 4x larger blocks (fewer, wider VPU ops).
  - The cos and sin DFT matrices are CONCATENATED and TRIMMED to the first 256
    frequency bins: every mel filter lives in bins 2..239 (f_max = 7500 Hz < Nyquist;
    asserted at trace time), so bins 240..256 contribute exactly nothing.  257 bins
    would pad to 3 lane tiles (384) per matrix; 2*256 is exactly 512 lanes, one
    perfectly tiled matmul with zero padding waste.

Grid: (B, ceil(T / FRAME_BLOCK)).  The DFT/mel matrices (~2.2 MB) stay resident in
VMEM across the grid.  Numerics match ``mel.mel_spectrogram(impl='dft')`` (tested)
and therefore torchaudio.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mel import (F_MAX, F_MIN, HOP_LENGTH, N_FFT, N_MELS, SAMPLE_RATE, WIN_LENGTH,
                  _dft_matrices_np, _mel_filterbank_np, _window_np)

FRAME_BLOCK = 512          # frames per program
K_USED = 256               # DFT bins kept (mel filters end at bin 239; see module doc)
_G = 32                    # granule: gcd(hop, n_fft)
_GPH = HOP_LENGTH // _G    # granules per hop = 5
_GPF = N_FFT // _G         # granules per frame = 16
_PACK = 128 // _G          # granules per packed 128-lane row = 4
_CLS = FRAME_BLOCK // _PACK  # frames per class = 128
# packed rows reached by a block: class-c frame k slab j sits at row
# 5k + (5c+j)//4 with k < _CLS, c < 4, j < 16 -> max 5*(_CLS-1) + 7; 8-aligned.
SPAN_ROWS = -(-(5 * (_CLS - 1) + 7 + 1) // 8) * 8   # 648
SPAN = SPAN_ROWS * 128     # samples covered per program


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """fp32-accurate matmul from three bf16 MXU passes (a_hi@b_hi + a_hi@b_lo +
    a_lo@b_hi), fp32 accumulation."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    dot = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)  # noqa: E731
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _make_kernel(rows_per_sample: int):
    def _kernel(audio_ref, win_ref, cs_ref, fb_ref,
                out_ref, span_ref, sem):
        b = pl.program_id(0)
        tb = pl.program_id(1)

        # packed row index of this block's first granule (multiple of 640)
        row_start = pl.multiple_of(
            b * rows_per_sample + tb * (FRAME_BLOCK * HOP_LENGTH // 128), 8)
        dma = pltpu.make_async_copy(
            audio_ref.at[pl.ds(row_start, SPAN_ROWS), :], span_ref, sem)
        dma.start()
        dma.wait()

        span = span_ref[:]  # (SPAN_ROWS, 128)
        # class-c frame k (i = 4k + c) granule j = granule 20k + 5c + j
        #   -> packed row 5k + (5c+j)//4, lane slab 32*((5c+j)%4)
        class_frames = []
        for c in range(_PACK):
            slabs = []
            for j in range(_GPF):
                s = (5 * c + j) // _PACK
                lane = _G * ((5 * c + j) % _PACK)
                block = span[s: s + 5 * _CLS]                  # (640, 128) static
                picked = block.reshape(_CLS, 5, 128)[:, 0, :]  # rows 5k + s
                slabs.append(picked[:, lane: lane + _G])       # static lane slice
            class_frames.append(jnp.concatenate(slabs, axis=1))  # (_CLS, 512)
        frames = jnp.concatenate(class_frames, axis=0)  # (FRAME_BLOCK, 512) class-major

        # Manual bf16x3 matmuls: the MXU ingests bf16 (3% relative error on a power
        # spectrum with the default single pass), Mosaic rejects Precision.HIGH, and
        # Precision.HIGHEST's 6-pass expansion explodes compile time.  Splitting each
        # operand into hi+lo bf16 halves and summing three native bf16 dots recovers
        # ~2^-16 relative accuracy at 3x the single-pass MXU cost.
        f = frames * win_ref[:]
        reim = _dot3(f, cs_ref[:])                      # (FRAME_BLOCK, 2*K_USED)
        power = reim[:, :K_USED] ** 2 + reim[:, K_USED:] ** 2
        mel = _dot3(power, fb_ref[:])
        # de-interleave class-major rows (_CLS*c + k) back to frame order (4k + c)
        mel = mel.reshape(_PACK, _CLS, N_MELS)
        mel = jnp.swapaxes(mel, 0, 1).reshape(FRAME_BLOCK, N_MELS)
        out_ref[0] = mel

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mel_pallas_2d(audio_padded: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """audio_padded: (B, L_pad) reflect- and block-padded, L_pad % 128 == 0.
    Returns (B, grid_t * FRAME_BLOCK, n_mels)."""
    B, L = audio_padded.shape
    grid_t = (L - SPAN) // (FRAME_BLOCK * HOP_LENGTH) + 1
    rows_per_sample = L // 128
    audio_rows = audio_padded.reshape(B * rows_per_sample, 128)

    window = jnp.asarray(_window_np(WIN_LENGTH, N_FFT))[None, :]  # (1, n_fft)
    cos_m, sin_m = _dft_matrices_np(N_FFT)
    fb_np = _mel_filterbank_np(SAMPLE_RATE, N_FFT, N_MELS, F_MIN, F_MAX)
    # bins >= K_USED carry no mel weight (f_max < Nyquist); trimming them is exact
    assert not fb_np[K_USED:].any(), "mel filterbank extends past K_USED bins"
    cs = np.concatenate([cos_m[:, :K_USED], sin_m[:, :K_USED]], axis=1)  # (512, 512)
    fb = jnp.asarray(fb_np[:K_USED])

    flops_per_block = 2 * FRAME_BLOCK * (2 * N_FFT * K_USED + K_USED * N_MELS) * 3
    out = pl.pallas_call(
        _make_kernel(rows_per_sample),
        grid=(B, grid_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # audio in HBM; manual DMA
            pl.BlockSpec((1, N_FFT), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, 2 * K_USED), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_USED, N_MELS), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, N_MELS), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, grid_t * FRAME_BLOCK, N_MELS),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((SPAN_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * grid_t * flops_per_block,
            bytes_accessed=B * (L + grid_t * FRAME_BLOCK * N_MELS) * 4,
            transcendentals=0),
        interpret=interpret,
    )(audio_rows, window, jnp.asarray(cs), fb)
    return out


def mel_spectrogram_pallas(audio: jnp.ndarray, sr: int = SAMPLE_RATE,
                           n_fft: int = N_FFT, win_length: int = WIN_LENGTH,
                           hop_length: int = HOP_LENGTH, n_mels: int = N_MELS,
                           f_min: float = F_MIN, f_max: float = F_MAX,
                           interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``mel.mel_spectrogram``: (..., L) -> (..., n_mels, T)."""
    assert (sr, n_fft, win_length, hop_length, n_mels, f_min, f_max) == (
        SAMPLE_RATE, N_FFT, WIN_LENGTH, HOP_LENGTH, N_MELS, F_MIN, F_MAX), (
        "pallas mel kernel is specialized to the reference's parameters")

    lead = audio.shape[:-1]
    L = audio.shape[-1]
    x = audio.reshape((-1, L))
    T = L // hop_length + 1

    # center=True reflect pad, then zero-pad so every grid block's span is
    # in-bounds and the length is 128-aligned for the packed-row view.
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    grid_t = -(-T // FRAME_BLOCK)
    need = (grid_t - 1) * FRAME_BLOCK * hop_length + SPAN
    need = max(need, x.shape[-1])
    need = -(-need // 128) * 128
    if need > x.shape[-1]:
        x = jnp.pad(x, [(0, 0), (0, need - x.shape[-1])])

    out = _mel_pallas_2d(x, interpret=interpret)  # (B, T_pad, n_mels)
    out = out[:, :T, :]
    out = jnp.swapaxes(out, -1, -2)  # (B, n_mels, T)
    return out.reshape(lead + (n_mels, T))
