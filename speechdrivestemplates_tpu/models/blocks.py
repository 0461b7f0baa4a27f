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

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (0.1)
NORM_EPS = 1e-5


def _normalize_free(x: jnp.ndarray, axes: Sequence[int]) -> jnp.ndarray:
    """Affine-free normalization over ``axes`` (torch InstanceNorm uses biased var)."""
    mean = jnp.mean(x, axis=tuple(axes), keepdims=True)
    var = jnp.var(x, axis=tuple(axes), keepdims=True)
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


class ConvNormRelu(nn.Module):
    """Conv -> Norm -> (Leaky)ReLU, 1D or 2D (reference building_blocks.py:4-55).

    kernel/stride/padding default to (3,1,1), or (4,2,1) when ``downsample``.
    ``padding`` follows torch symmetric-int semantics; pass 0 for VALID.
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

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        ndim = 2 if self.conv_type == "2d" else 1
        if self.kernel_size is None:
            k, s, p = ((4, 2, 1) if self.downsample else (3, 1, 1))
        else:
            k, s, p = self.kernel_size, self.stride, self.padding
        k = (k,) * ndim if isinstance(k, int) else tuple(k)
        s = (s,) * ndim if isinstance(s, int) else tuple(s)
        p = (p,) * ndim if isinstance(p, int) else tuple(p)
        pad = [(pi, pi) for pi in p]

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

        if self.norm == "BN":
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
                x = _normalize_free(x, axes=(-3, -2))
            else:
                # Reference IN-1d permute quirk: normalize over channels per position.
                x = _normalize_free(x, axes=(-1,))
        else:
            raise NotImplementedError(f"norm {self.norm!r}")

        return nn.leaky_relu(x, 0.2) if self.leaky else nn.relu(x)


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
