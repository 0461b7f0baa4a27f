"""Fused conv1+IN1+lrelu Pallas TPU kernel — the full-resolution stem layer.

The AudioEncoder's first layer (reference generator.py:24: ConvNormRelu
1->64, k3 s1 p1, InstanceNorm, leaky-relu) runs at full mel resolution
(80 x T_mel), so in the plain XLA lowering it is the most HBM-expensive
segment of the serving forward: the (B, 80, T, 64) activation (~0.5 GB at
serving batch 128) crosses HBM several times (conv write, IN stats read,
IN-apply read+write) while carrying trivial FLOPs (1 input channel).  This
kernel reads the RAW MEL (~70 KB/sample instead of ~4.4 MB/sample), computes
conv1 + InstanceNorm + leaky-relu per sample entirely in VMEM, and writes the
activation to HBM exactly once.

Why this succeeds where probes/stem_pallas.py (the round-2 3-layer fusion, a
documented negative result) lost to XLA — every expensive Mosaic pattern is
designed out, guided by the tap-shift cost probe (bench_profile.py
--shift-probe, measured 2026-08-17 on v5e):

  - **No 4D mid-dim tap slices.** The r2 kernel's per-tap reads were 4D
    mid-dimension slices that each lower to whole-slab vector shuffles.  Here
    the broadcast mel plane is a plain (rows, cols, 64) value whose 9 tap
    reads slice only the leading dim (free) and the sublane dim (measured
    ~89% of peak even at sub-tile offsets).
  - **No lane-dim work.** mel arrives as (B, rows, cols, 1) — lane dim 1 —
    so "put the mel value in every channel" is a native lane broadcast, not
    a transpose relayout.  Channels (64) live in lanes from birth.
  - **No MXU starvation.** conv1 has 1 input channel: as a matmul it would
    be K=9 (measured: K<128 collapses MXU efficiency).  It is instead 9
    broadcast FMAs on the VPU — ~20M f32 FMA/sample, ~0.7 ms at batch 128,
    well under the HBM write floor it overlaps with.

Layout contract with the consumer (AudioEncoder layer 1, conv k4 s2 p1):
the output is (B, 82, W, 64) with rows 0 and 81 zero and the data in rows
1..80 — i.e. the activation pre-padded in h.  Layer 1 then runs with
padding=(0, 1): h-VALID (the zero rows ARE torch's padding) and the usual
symmetric w padding.  (82-4)//2+1 == (80+2-4)//2+1 and the zero rows equal
torch's zeros, so the composition is exactly the reference's layer-1 conv.

Numerics: taps and accumulation in fp32 (the mel is converted once), IN
statistics fp32 with biased variance and eps 1e-5 — the same semantics as
models/blocks.py `_normalize_free` — then cast to the compute dtype.
Matches the XLA path to ~1e-6 in fp32 (see tests/test_conv1_pallas.py).

MEASURED OUTCOME (v5e, batch 128, W=427, bf16; bench_profile.py
--conv1-probe, 2026-08-17): numerically correct on hardware (4.9e-3 rel err
vs the XLA composition, bf16 grade) but **11.2 ms vs 3.36 ms for XLA's own
conv1+IN1 lowering** — a documented NEGATIVE result; the kernel is NOT wired
into any model path.  Root cause (a different failure class than
probes/stem_pallas.py): each of the 9 whole-plane elementwise tap FMAs is one
VMEM traversal that re-reads the 9 MB fp32 broadcast plane AND re-reads +
re-writes the fp32 accumulator (~27 MB x 9 taps x 128 samples ~ 31 GB of
VMEM traffic ~ 10 ms) — elementwise accumulation loops over whole-plane
values do not keep the accumulator in registers.  The tap-matmul form
(probes/stem_pallas.py style, probe-verified at ~89% of peak) avoids this, but
for THIS layer it is K=9/K=16 MXU starvation, and XLA's 3.36 ms is already
within ~1.7x of the segment's 3-pass VMEM/HBM floor — there is no meaningful
headroom for any hand kernel here.  Together with probes/stem_pallas.py this
closes the stem question from both directions: matmul-formulated fusion
loses to padded-density FLOP waste, VPU-formulated fusion loses to
whole-plane accumulate traffic.  Kept as a tested record with the probe data
(docs/PERF.md "Stem speed-of-light").
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechdrivestemplates_tpu.models.blocks import NORM_EPS  # mirrors the XLA path

H1 = 80                  # mel bins (fixed by the model family)
ROWS = H1 + 2            # h-padded rows: 0 and 81 stay zero
MAX_W1 = 448             # VMEM budget gate; longer demo mels fall back to XLA
_FORCE_INTERPRET = False  # tests set True to run the kernel on CPU


def _ceil16(n: int) -> int:
    return -(-n // 16) * 16


def _make_kernel(w1_width: int, wp: int, slope: float, dtype):
    n1 = float(H1 * w1_width)
    f32 = jnp.float32

    def _kernel(mel_ref, w_ref, out_ref, m3_ref):
        # mel_ref: (1, ROWS, wp, 1) zero-padded (data rows 1..80, cols 1..W1)
        # w_ref:   (16, 64) f32 — rows 3*dy+dx carry w1[dy, dx, 0, :]
        # out_ref: (1, ROWS, w1_width, 64)
        # m3_ref:  (ROWS, wp, 64) f32 scratch — lane-broadcast mel
        m3_ref[:] = jnp.broadcast_to(mel_ref[0].astype(f32),
                                     (ROWS, wp, 64))
        acc = jnp.zeros((H1, w1_width, 64), f32)
        for dy in range(3):
            for dx in range(3):
                tap = m3_ref[dy: dy + H1, dx: dx + w1_width, :]
                acc += tap * w_ref[3 * dy + dx, :]
        s = jnp.sum(acc, axis=(0, 1))                   # (64,)
        sq = jnp.sum(acc * acc, axis=(0, 1))
        mean = s / n1
        var = sq / n1 - mean * mean
        inv = jax.lax.rsqrt(var + NORM_EPS)
        y = (acc - mean) * inv
        y = jnp.where(y > 0, y, slope * y) if slope else jnp.maximum(y, 0.0)
        out_ref[0, 1: 1 + H1] = y.astype(dtype)
        out_ref[0, 0] = jnp.zeros((w1_width, 64), dtype)
        out_ref[0, 1 + H1] = jnp.zeros((w1_width, 64), dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("w1_width", "slope", "dtype",
                                             "interpret"))
def _conv1_pallas(mel_padded, w_taps, *, w1_width: int, slope: float,
                  dtype, interpret: bool = False):
    B, rows, wp, one = mel_padded.shape
    kernel = _make_kernel(w1_width, wp, slope, dtype)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, wp, 1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 64), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, w1_width, 64),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, w1_width, 64), dtype),
        scratch_shapes=[pltpu.VMEM((rows, wp, 64), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 9 * H1 * w1_width * 64,
            bytes_accessed=B * (rows * wp * 4 + rows * w1_width * 64 * 2),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mel_padded, w_taps)


def conv1_supported(w1_width: int, norm: str, dtype: Any) -> bool:
    """Covers the flagship inference configuration: IN-normalized encoder,
    width within the VMEM budget, TPU backend (or forced interpret)."""
    return (norm == "IN" and 3 <= w1_width <= MAX_W1
            and dtype in (jnp.bfloat16, jnp.float32)
            and (_FORCE_INTERPRET
                 or jax.default_backend() not in ("cpu", "gpu")))


def fused_conv1_in(mel: jnp.ndarray, w1: jnp.ndarray, *, slope: float = 0.2,
                   dtype=jnp.bfloat16,
                   interpret: bool | None = None) -> jnp.ndarray:
    """lrelu(InstanceNorm(conv1(mel))), h-pre-padded for the layer-1 conv.

    mel: (B, 80, W1) -> (B, 82, W1, 64); rows 0/81 zero, rows 1..80 equal the
    reference's first ConvNormRelu (generator.py:24) with norm='IN' in eval
    mode.  Feed the result to layer 1 with padding=(0, 1) (h-VALID).

    w1: flax HWIO conv kernel (3, 3, 1, 64).
    """
    if interpret is None:
        interpret = _FORCE_INTERPRET
    B, h, w1_width = mel.shape
    assert h == H1, f"expected {H1} mel bins, got {h}"
    wp = _ceil16(w1_width + 2)
    # data at rows 1..80, cols 1..W1; everything else zero
    mel_padded = jnp.pad(mel.astype(jnp.float32),
                         ((0, 0), (1, 1), (1, wp - 1 - w1_width)))[..., None]
    w_taps = jnp.pad(w1.astype(jnp.float32).reshape(9, 64), ((0, 7), (0, 0)))
    return _conv1_pallas(mel_padded, w_taps, w1_width=w1_width, slope=slope,
                         dtype=dtype, interpret=interpret)
