"""Building blocks, TPU-first layouts.

Reference: ``core/networks/building_blocks.py:4-76`` (ConvNormRelu / FCNormRelu).
Design notes (differences from a literal translation, all intentional):
  - Channels-last everywhere: 1D tensors are (B, T, C), 2D are (B, H, W, C) — the
    layouts XLA:TPU tiles onto the MXU/VPU without transposes.
  - Norm semantics are pinned to the reference's *runtime behavior*, not its class
    names:
      * 'BN'  -> torch BatchNorm (momentum 0.1, eps 1e-5, affine, running stats).
      * 'IN' on 2D -> torch InstanceNorm2d: per-(sample, channel) normalization over
        (H, W), no affine, no running stats.
      * 'IN' on 1D -> the reference permutes to (B, T, C) before InstanceNorm1d
        (building_blocks.py:50-52), which makes it normalize over the CHANNEL axis at
        each time position.  That is exactly a per-position, affine-free layer norm,
        implemented here directly.
  - Conv init: Kaiming normal, fan_in, gain sqrt(2) (torch kaiming_normal_ defaults,
    building_blocks.py:44).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.patches_conv import conv_as_patches_matmul

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (0.1)
NORM_EPS = 1e-5


def _normalize_free(x: jnp.ndarray, axes: Sequence[int]) -> jnp.ndarray:
    """Affine-free normalization over ``axes`` (torch InstanceNorm uses biased var)."""
    mean = jnp.mean(x, axis=tuple(axes), keepdims=True)
    var = jnp.var(x, axis=tuple(axes), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + NORM_EPS)


def _normalize_free_masked(x: jnp.ndarray, axes: Sequence[int],
                           t_valid, time_axis: int = -2) -> jnp.ndarray:
    """:func:`_normalize_free` with statistics over only the valid time prefix.

    ``x`` must already be zero beyond ``t_valid`` on ``time_axis``; the biased
    mean/var then reduce to masked sums divided by the valid element count, so
    the valid block matches an unbucketed (length == t_valid) normalization.
    Uses the same two-pass (center, then square) form as ``jnp.var``.
    """
    axes = tuple(a % x.ndim for a in axes)
    assert time_axis % x.ndim in axes
    count = jnp.asarray(t_valid, jnp.float32)
    for a in axes:
        if a != time_axis % x.ndim:
            count = count * x.shape[a]
    mean = jnp.sum(x, axis=axes, keepdims=True) / count.astype(x.dtype)
    from ..ops.resize import mask_time

    xc = mask_time(x - mean, t_valid, axis=time_axis)
    var = jnp.sum(xc * xc, axis=axes, keepdims=True) / count.astype(x.dtype)
    return (x - mean) * jax.lax.rsqrt(var + NORM_EPS)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch running-stat semantics.

    Normalization in train mode uses the biased batch variance (as both torch
    and flax do), but the running-var EMA ingests the UNBIASED variance
    (``n/(n-1)`` correction) — torch BatchNorm1d/2d behavior that
    ``flax.linen.BatchNorm`` does not reproduce (it EMAs the biased one).
    Variable names (params scale/bias, batch_stats mean/var) match flax's so
    checkpoints and the torch importer are unchanged.  Statistics are always
    computed in fp32 even when the compute dtype is bf16.
    """

    use_running_average: bool = False
    momentum: float = 0.9  # flax convention: decay of the old running value
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class PatchesConv(nn.Module):
    """2D conv expressed as patch extraction + ONE ``dot_general``.

    Forward-identical to ``nn.Conv`` (same ``{"kernel": (kh, kw, ci, co)}``
    param tree, so checkpoints interop), but autodiff of a ``dot_general``
    yields matmul gradients instead of XLA's conv-transpose / conv-filter-grad
    kernels — the candidate fix for the measured batch-128 train gap
    (docs/PERF.md "train speed-of-light": the 1.37x-floor residue sits in
    conv-backward achieved bandwidth on the full-res stem planes).  Feature
    order of ``conv_general_dilated_patches`` is (C_in major, kh, kw) —
    pinned by tests/test_misc.py::test_conv_as_patches_matmul_matches_conv.
    """

    features: int
    kernel_size: Any = None
    strides: Any = None
    padding: Any = None  # [(p, p), (p, p)]
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        ci = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal,
                            (kh, kw, ci, self.features), jnp.float32)
        dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return conv_as_patches_matmul(x.astype(dtype), kernel.astype(dtype),
                                      self.strides, self.padding)


class ConvNormRelu(nn.Module):
    """Conv -> Norm -> (Leaky)ReLU, 1D or 2D (reference building_blocks.py:4-55).

    kernel/stride/padding default to (3,1,1), or (4,2,1) when ``downsample``.
    ``padding`` follows torch symmetric-int semantics; pass 0 for VALID.
    ``mm_grad`` swaps the 2D conv for :class:`PatchesConv` (matmul gradients;
    same params) when the input has >1 channel — wired from SYS.CONV_MM_GRAD.
    """

    conv_type: str = "1d"
    out_channels: int = 64
    downsample: bool = False
    kernel_size: Any = None
    stride: Any = None
    padding: Any = None
    norm: str = "BN"
    leaky: bool = False
    dtype: Any = None  # compute dtype (None -> float32)
    mm_grad: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 t_valid=None) -> jnp.ndarray:
        """``t_valid`` (optional traced scalar): valid length of THIS LAYER'S
        OUTPUT along the time axis (axis -2 in both layouts) — the caller
        derives it with ops.resize.conv_time_out_valid.  When set, the input
        is assumed zero beyond its own valid prefix; the output is normalized
        over the valid region only and re-zeroed beyond it, making the valid
        block bit-compatible with an unbucketed forward (demo length
        bucketing).  Inference-only for 'BN' (running stats)."""
        ndim = 2 if self.conv_type == "2d" else 1
        if self.kernel_size is None:
            k, s, p = ((4, 2, 1) if self.downsample else (3, 1, 1))
        else:
            k, s, p = self.kernel_size, self.stride, self.padding
        k = (k,) * ndim if isinstance(k, int) else tuple(k)
        s = (s,) * ndim if isinstance(s, int) else tuple(s)
        p = (p,) * ndim if isinstance(p, int) else tuple(p)
        pad = [(pi, pi) for pi in p]

        if self.mm_grad and ndim == 2 and x.shape[-1] > 1:
            # patches-matmul formulation (C_in=1 stays on nn.Conv: its K=9
            # contraction would starve the MXU for no bandwidth win)
            x = PatchesConv(features=self.out_channels, kernel_size=k,
                            strides=s, padding=pad, dtype=self.dtype,
                            name="conv")(x)
        else:
            x = nn.Conv(
                features=self.out_channels,
                kernel_size=k,
                strides=s,
                padding=pad,
                use_bias=False,
                kernel_init=kaiming_normal,
                dtype=self.dtype,
                name="conv",
            )(x)
        if t_valid is not None:
            from ..ops.resize import mask_time

            x = mask_time(x, t_valid, axis=-2)

        if self.norm == "BN":
            assert t_valid is None or not train, \
                "valid-masked BN only supports eval (running stats)"
            x = TorchBatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=NORM_EPS,
                dtype=self.dtype,
                name="norm",
            )(x)
        elif self.norm == "IN":
            if ndim == 2:
                # InstanceNorm2d: normalize over (H, W) per sample & channel.
                if t_valid is not None:
                    x = _normalize_free_masked(x, axes=(-3, -2), t_valid=t_valid)
                else:
                    x = _normalize_free(x, axes=(-3, -2))
            else:
                # Reference IN-1d permute quirk: normalize over channels per position.
                x = _normalize_free(x, axes=(-1,))
        else:
            raise NotImplementedError(f"norm {self.norm!r}")

        x = nn.leaky_relu(x, 0.2) if self.leaky else nn.relu(x)
        if t_valid is not None:
            from ..ops.resize import mask_time

            x = mask_time(x, t_valid, axis=-2)
        return x


class FCNormRelu(nn.Module):
    """Linear -> Norm -> (Leaky)ReLU (reference building_blocks.py:57-76; defined but
    unused upstream, kept for API parity)."""

    out_features: int = 256
    norm: str = "BN"
    leaky: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.out_features, use_bias=False, kernel_init=kaiming_normal,
                     dtype=self.dtype)(x)
        if self.norm == "BN":
            x = TorchBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                               epsilon=NORM_EPS, dtype=self.dtype, name="norm")(x)
        elif self.norm == "IN":
            x = _normalize_free(x, axes=(-1,))
        return nn.leaky_relu(x, 0.2) if self.leaky else nn.relu(x)
