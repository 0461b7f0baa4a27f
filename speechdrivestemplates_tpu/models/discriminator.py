"""LSGAN pose-sequence discriminator.

Reference: ``core/networks/keypoints_generation/discriminator.py:6-23``.  Input is a
pose sequence (B, T, 2, K); flattened to (B, T, 2K) (channels last — the reference
transposes to channels-first for torch Conv1d) and scored per temporal position.
Norm layers are BN (the reference's ConvNormRelu default).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvNormRelu


class PoseSequenceDiscriminator(nn.Module):
    leaky: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, poses: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        B, T = poses.shape[0], poses.shape[1]
        x = poses.reshape(B, T, -1)  # (B, T, 2K)
        x = ConvNormRelu("1d", 256, downsample=True, leaky=self.leaky,
                         dtype=self.dtype)(x, train)
        x = ConvNormRelu("1d", 512, downsample=True, leaky=self.leaky,
                         dtype=self.dtype)(x, train)
        x = ConvNormRelu("1d", 1024, kernel_size=3, stride=1, padding=1,
                         leaky=self.leaky, dtype=self.dtype)(x, train)
        x = nn.Conv(1, kernel_size=(3,), strides=(1,), padding=[(1, 1)], use_bias=True,
                    dtype=self.dtype)(x)
        return x[..., 0]  # (B, T//4) per-position real/fake scores
