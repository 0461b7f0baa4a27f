"""Fused audio-encoder "stem" Pallas TPU kernel (inference path).

The first three layers of the AudioEncoder (reference generator.py:8-43 —
conv1(1->64, k3) + IN + lrelu, conv2(64->64, k4 s2) + IN + lrelu,
conv3(64->128, k3) + IN + lrelu) run at FULL mel resolution, so in the plain
XLA lowering they are HBM-bound, not MXU-bound: each InstanceNorm is a global
(H, W) reduction that forces the (B, 80, T, 64) activation (~0.5 GB at serving
batch) through HBM ~4x per layer.  Measured on v5e at batch 128 they cost
6.3 ms of the 8.25 ms generator forward while carrying only ~37% of its FLOPs.

This kernel keeps one sample's entire activation plane resident in VMEM and
chains IN1 -> conv2 -> IN2 -> conv3 -> IN3 with a single HBM read of conv1's
output and a single write of layer 3's output.  conv1 itself stays in XLA (its
FLOPs are trivial; fusing it would only add an awkward K=9 matmul) — XLA fuses
it with the pack/pad reshape below.

Layout rules that make Mosaic happy (all shapes static at trace time):
  - **w-pair lane packing for layer 1**: 64 channels waste half of the 128-lane
    registers, so conv1's output is stored as (h, w//2, 128) with
    lane = (w % 2) * 64 + c.  The k4-stride-2 conv2 then needs NO strided
    access: tap (dy, dx) reads lane half (dx+1) % 2 at a static pair offset —
    the stride-2 w-walk is absorbed by the packing.
  - **h stride-2 via leading-dim split**: the buffer is declared
    (41, 2, pairs, 128); conv2's row 2h'+dy is the static slice
    [dy//2 : dy//2+40, dy%2].
  - **tile-aligned tap slices**: Mosaic's vector layout cannot merge
    (40, 213, 64) -> (8520, 64) (213 rows is not a multiple of the 16-sublane
    bf16 tile).  Every tap slice is therefore padded to W_SLICE = ceil16(W2)
    columns; the surplus columns are guaranteed zero in the buffers, so the
    surplus output rows are exactly zero through the matmul and are sliced off
    at the end.  InstanceNorm sums are immune (zeros add nothing) and divide
    by the true element count.
  - **InstanceNorm by zero-padded sums**: borders and w-tail pads are kept
    exactly zero, so per-channel sums over the whole buffer equal sums over
    the data region.  Layer 1's channel c combines lanes c and 64+c of the
    packed reduction.
  - **conv as full-lane tap-matmuls**: conv2 = 12 and conv3 = 9 static
    (M, 128) @ (128, N) MXU passes accumulated in fp32 — the lane-half
    selection of the packed layout lives in zero/stacked rows of the WEIGHT
    matrices, so no operand is ever lane-sliced.  Layer 2's buffer stays
    UNPACKED (channels in the low 64 lanes, upper half zero) so the stride-1
    conv3 taps are plain static slices.

Numerics: matmuls are compute-dtype (bf16 on the flagship path) with fp32
accumulation — the same contraction precision as XLA's conv lowering — and IN
statistics are fp32, matching models/blocks.py semantics (biased variance,
eps 1e-5).  A float32 mode exists for exactness tests (matches the XLA path to
~1e-6 in interpret mode; see tests/test_stem_pallas.py).

Used only when ``train=False`` (no BatchNorm state, no autodiff needed) — the
training step keeps the XLA lowering.

MEASURED OUTCOME (v5e, batch 128, W1=427, bf16): the kernel is numerically
correct on hardware (0.6% mean error vs the fp32 XLA reference — bf16 grade)
but runs at ~15 ms vs ~6.3 ms for XLA's own conv+IN lowering of the same three
layers, so ``SYS.FUSED_STEM`` defaults to OFF.  Root cause: a tap-matmul
convolution reads the activation plane k_h*k_w (= 25) times; XLA's implicit
GEMM pipelines those reads inside one fused conv, while in Mosaic each tap is
an explicit VMEM->register slice at a sub-tile offset that lowers to per-tile
shift ops (~48 MB of shifted vector moves per sample, ~6x the MXU time).  The
HBM-traffic saving (the design goal) is real but the VMEM shuffle cost eats
it.  Kept as a tested, flag-gated path: it is the honest record of where a
hand kernel does NOT beat the XLA conv lowering on this hardware generation,
and the layout techniques documented above are reused by future kernels.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NORM_EPS = 1e-5
H1 = 80                 # mel bins: conv1 output height (fixed by the model family)
MAX_W1 = 448            # VMEM budget gate; longer demo mels fall back to XLA
_FORCE_INTERPRET = False  # tests set True to run the kernel on CPU


def stem_dims(w1_width: int):
    """Static shape helpers for an input mel width (= conv1 output width)."""
    h2 = (H1 - 2) // 2 + 1                    # 40
    w2 = (w1_width - 2) // 2 + 1              # conv2/conv3 output width
    w_slice = -(-w2 // 16) * 16               # tap-slice width (bf16 tile rows)
    pairs1 = w_slice + 8                      # packed columns of layer-1 buffer
    w2buf = w_slice + 8                       # columns of layer-2 buffer
    return h2, w2, w_slice, pairs1, w2buf


def _lrelu(x, slope: float):
    return jnp.where(x > 0, x, slope * x) if slope else jnp.maximum(x, 0.0)


def _make_kernel(w1_width: int, slope: float, dtype):
    h2, w2, w_slice, p1, w2buf = stem_dims(w1_width)
    n1 = float(H1 * w1_width)
    n2 = float(h2 * w2)
    f32 = jnp.float32
    data_pairs = (w1_width + 1) // 2          # packed pairs holding data


    def _norm_vec(s, sq, n):
        mean = s / n
        var = sq / n - mean * mean
        inv = jax.lax.rsqrt(var + NORM_EPS)
        return mean, inv

    def _mask_rows(x3d, lanes):
        """Zero the surplus tap rows (w >= w2): they read in-range data, so
        they are NOT naturally zero and would pollute the IN statistics."""
        if w_slice == w2:
            return x3d
        keep = jax.lax.broadcasted_iota(jnp.int32, (h2, w_slice, lanes), 1) < w2
        return jnp.where(keep, x3d, 0.0)

    def _kernel(x_hbm, w2_ref, w3_ref, out_ref, y1_ref, y2_ref, sem_in):
        b = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[b], y1_ref, sem_in)
        dma.start()
        dma.wait()

        # ---- IN1 + lrelu, in place (zero borders/pads never touched) -------
        x = y1_ref[:].astype(f32)
        s = jnp.sum(x, axis=(0, 1, 2))            # (128,)
        sq = jnp.sum(x * x, axis=(0, 1, 2))
        mean = (s[:64] + s[64:]) / n1
        var = (sq[:64] + sq[64:]) / n1 - mean * mean
        inv = jax.lax.rsqrt(var + NORM_EPS)
        mean128 = jnp.concatenate([mean, mean])
        inv128 = jnp.concatenate([inv, inv])
        # data rows h_pad 1..80 as two leading-dim slices (h_pad = 2a + par)
        for (a0, par) in ((1, 0), (0, 1)):
            sl = (slice(a0, a0 + 40), par, slice(1, 1 + data_pairs),
                  slice(None))
            v = y1_ref[sl].astype(f32)
            y1_ref[sl] = _lrelu((v - mean128) * inv128, slope).astype(dtype)
        if w1_width % 2:
            # odd width: the last data pair's high half is a pad column that
            # the in-place normalize above corrupted — restore its zeros
            y1_ref[:, :, data_pairs, 64:] = jnp.zeros((41, 2, 64), dtype)

        # ---- conv2 (k4 s2 p1): 12 full-lane tap-matmuls ---------------------
        # The (dx) taps select a lane half; that selection lives in the WEIGHT
        # matrices (the other 64 K-rows are zero or carry the paired tap), so
        # every operand is a full-128-lane, tile-aligned value — no lane
        # slicing, no layout shuffles.  K rows [0:64] act on even-w lanes,
        # [64:128] on odd-w lanes; dx=1/dx=2 share a pair offset and fuse.
        m = h2 * w_slice
        acc = jnp.zeros((m, 128), f32)
        for dy in range(4):
            for j in range(3):                     # pair offsets p0 = j
                t = 3 * dy + j
                v = y1_ref[dy // 2: dy // 2 + h2, dy % 2, j: j + w_slice, :]
                acc += jnp.dot(v.reshape(m, 128),
                               w2_ref[128 * t: 128 * t + 128, :],
                               preferred_element_type=f32)

        # ---- IN2 + lrelu ----------------------------------------------------
        # output lanes [64:128] are zero by construction (zero weight columns)
        acc = _mask_rows(acc.reshape(h2, w_slice, 128), 128)
        mean, inv = _norm_vec(jnp.sum(acc, (0, 1)), jnp.sum(acc * acc, (0, 1)),
                              n2)
        y2 = _lrelu((acc - mean) * inv, slope).astype(dtype)[:, :w2, :]
        y2_ref[:] = jnp.zeros((h2 + 2, w2buf, 128), dtype)
        y2_ref[1:1 + h2, 1:1 + w2, :] = y2

        # ---- conv3 (k3 s1 p1): 9 full-lane tap-matmuls ----------------------
        # y2's channels live in lanes [0:64]; W3's K rows [64:128] are zero
        acc3 = jnp.zeros((m, 128), f32)
        for dy in range(3):
            for dx in range(3):
                t = 3 * dy + dx
                v = y2_ref[dy: dy + h2, dx: dx + w_slice, :]
                acc3 += jnp.dot(v.reshape(m, 128),
                                w3_ref[128 * t: 128 * t + 128, :],
                                preferred_element_type=f32)

        # ---- IN3 + lrelu + store ---------------------------------------------
        acc3 = _mask_rows(acc3.reshape(h2, w_slice, 128), 128)
        mean, inv = _norm_vec(jnp.sum(acc3, (0, 1)),
                              jnp.sum(acc3 * acc3, (0, 1)), n2)
        out_ref[0] = _lrelu((acc3 - mean) * inv, slope).astype(dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("w1_width", "slope", "dtype",
                                             "interpret"))
def _stem_pallas(x_packed, w2_taps, w3_taps, *, w1_width: int, slope: float,
                 dtype, interpret: bool = False):
    B = x_packed.shape[0]
    h2, w2, w_slice, p1, w2buf = stem_dims(w1_width)
    flops = 2 * B * h2 * w_slice * 128 * (12 + 9) * 128
    out = pl.pallas_call(
        _make_kernel(w1_width, slope, dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),      # packed conv1 output
            pl.BlockSpec((12 * 128, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * 128, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h2, w_slice, 128), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h2, w_slice, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((41, 2, p1, 128), dtype),
            pltpu.VMEM((h2 + 2, w2buf, 128), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * (82 * p1 + h2 * w_slice) * 128 * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            # ~12 MB of declared buffers + whole-plane fp32 transients; the
            # default Mosaic cap is too tight for this design (v5e has 128 MB)
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_packed, w2_taps, w3_taps)
    return out


def stem_supported(w1_width: int, norm: str, dtype: Any) -> bool:
    """The kernel covers the flagship inference configuration: IN-normalized
    encoder, width within the VMEM budget, TPU backend."""
    return (norm == "IN" and w1_width >= 8 and w1_width <= MAX_W1
            and dtype in (jnp.bfloat16,)
            and (_FORCE_INTERPRET
                 or jax.default_backend() not in ("cpu", "gpu")))


def stem_weights_from_params(params_g) -> tuple | None:
    """The three stem conv kernels out of a generator param tree, or None when
    the tree does not look like a SequenceGeneratorCNN."""
    try:
        ae = params_g["audio_encoder"]
        return tuple(ae[f"ConvNormRelu_{i}"]["conv"]["kernel"] for i in range(3))
    except (KeyError, TypeError):
        return None


def fused_audio_encoder_stem(mel: jnp.ndarray, w1, w2, w3, *,
                             slope: float = 0.2, dtype=jnp.bfloat16,
                             interpret: bool | None = None) -> jnp.ndarray:
    """conv1 (XLA) + fused [IN1, conv2, IN2, conv3, IN3] (Pallas).

    mel: (B, 80, T_mel) -> (B, 40, W2, 128), identical (up to accumulation
    order) to the first three ConvNormRelu layers of the AudioEncoder
    (reference generator.py:24-31) with norm='IN' in eval mode.

    w1/w2/w3: flax HWIO conv kernels (3,3,1,64), (4,4,64,64), (3,3,64,128).
    """
    if interpret is None:
        interpret = _FORCE_INTERPRET
    B, h, w1_width = mel.shape
    assert h == H1, f"expected {H1} mel bins, got {h}"
    h2, w2_w, w_slice, p1, w2buf = stem_dims(w1_width)

    x = mel[..., None].astype(dtype)
    y0 = jax.lax.conv_general_dilated(
        x, w1.astype(dtype), window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # pack w-pairs into 128 lanes with zero borders: pad w by 2 on the left
    # (covers tap w = -1) and out to 2*p1 on the right, pad h by 1 each side
    pad_r = 2 * p1 - 2 - w1_width
    y0 = jnp.pad(y0, ((0, 0), (1, 1), (2, pad_r), (0, 0)))
    x_packed = y0.reshape(B, 41, 2, p1, 128)

    # conv2 weights as 12 (128, 128) full-lane matrices (3 pair-offsets x 4 dy):
    # K rows [0:64] act on even-w lanes, [64:128] on odd-w lanes; output
    # columns [64:128] are zero so the accumulator keeps full-lane layout
    w2d = w2.astype(dtype)
    z64 = jnp.zeros((64, 64), dtype)
    mats = []
    for dy in range(4):
        mats.append(jnp.concatenate([z64, w2d[dy, 0]], axis=0))        # p0=0
        mats.append(jnp.concatenate([w2d[dy, 1], w2d[dy, 2]], axis=0))  # p0=1
        mats.append(jnp.concatenate([w2d[dy, 3], z64], axis=0))        # p0=2
    w2_taps = jnp.pad(jnp.concatenate(mats, axis=0), ((0, 0), (0, 64)))
    # conv3 weights: y2's channels live in lanes [0:64] -> K rows [64:128] zero
    w3d = w3.astype(dtype).reshape(9, 64, 128)
    w3_taps = jnp.pad(w3d, ((0, 0), (0, 64), (0, 0))).reshape(9 * 128, 128)
    out = _stem_pallas(x_packed, w2_taps, w3_taps, w1_width=w1_width,
                       slope=slope, dtype=dtype, interpret=interpret)
    return out[:, :, :w2_w, :]
