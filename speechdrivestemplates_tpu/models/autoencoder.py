"""Pose-sequence VAE (template extraction + FGD feature encoder).

Reference: ``core/networks/poses_reconstruction/autoencoder.py`` (PoseSeqEncoder:8-35,
PoseSeqDecoder:37-69, Autoencoder:71-93).  Two reference quirks are preserved exactly
because checkpoints and metrics depend on them:
  - The encoder's "global pooling" is ``F.interpolate(x, 1)`` with torch's default
    *nearest* mode, which for output size 1 selects index 0 — i.e. it takes the FIRST
    temporal position, not a mean (autoencoder.py:32).
  - The decoder seed is ``F.interpolate(code.unsqueeze(-1), 2)`` — nearest upsample of
    a length-1 sequence, i.e. the code repeated twice (autoencoder.py:60).
  - Channel-interleaved latent split: even channels are mu, odd are logvar
    (autoencoder.py:34-35).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import interpolate_linear_time
from .blocks import ConvNormRelu


class PoseSeqEncoder(nn.Module):
    """(B, T, 2, K) -> (mu, logvar), each (B, code_dim)."""

    num_landmarks: int = 121
    code_dim: int = 32
    norm: str = "BN"
    leaky: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, poses: jnp.ndarray, train: bool = True):
        B, T = poses.shape[0], poses.shape[1]
        x = poses.reshape(B, T, -1)  # (B, T, 2K) channels-last
        cnr = lambda ch, down: ConvNormRelu(  # noqa: E731
            "1d", ch, downsample=down, norm=self.norm, leaky=self.leaky, dtype=self.dtype)
        x = cnr(256, False)(x, train)
        x = cnr(256, False)(x, train)
        x = cnr(256, True)(x, train)
        x = cnr(256, True)(x, train)
        x = cnr(256, True)(x, train)
        x = cnr(256, True)(x, train)
        x = cnr(self.code_dim * 2, True)(x, train)
        x = x[:, 0, :]  # nearest-interpolate-to-1 == take first position
        mu = x[:, 0::2]
        logvar = x[:, 1::2]
        return mu, logvar


class PoseSeqDecoder(nn.Module):
    """(B, code_dim) -> (B, 64, 2K) pose sequence (fixed 64-frame generation)."""

    num_landmarks: int = 121
    code_dim: int = 32
    norm: str = "BN"
    leaky: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, code: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = code[:, None, :]  # (B, 1, code_dim)
        x = jnp.concatenate([x, x], axis=1)  # nearest upsample 1 -> 2
        cnr = lambda name: ConvNormRelu(  # noqa: E731
            "1d", 256, norm=self.norm, leaky=self.leaky, dtype=self.dtype, name=name)
        for name in ["d5", "d4", "d3", "d2", "d1"]:
            x = interpolate_linear_time(x, x.shape[1] * 2)
            x = cnr(name)(x, train)
        for i in range(4):
            x = ConvNormRelu("1d", 256, norm=self.norm, leaky=self.leaky,
                             dtype=self.dtype, name=f"block_{i}")(x, train)
        x = nn.Conv(self.num_landmarks * 2, kernel_size=(1,), use_bias=True,
                    dtype=self.dtype, name="out")(x)
        return x  # (B, 64, 2K)


class Autoencoder(nn.Module):
    """VAE with reparameterization; ``external_code`` bypasses the encoder
    (reference autoencoder.py:71-93)."""

    num_landmarks: int = 121
    code_dim: int = 32
    norm: str = "BN"
    leaky: bool = True
    dtype: Any = None

    def setup(self):
        self.encoder = PoseSeqEncoder(self.num_landmarks, self.code_dim, self.norm,
                                      self.leaky, self.dtype)
        self.decoder = PoseSeqDecoder(self.num_landmarks, self.code_dim, self.norm,
                                      self.leaky, self.dtype)

    def __call__(self, poses: Optional[jnp.ndarray], num_frames: int,
                 external_code: Optional[jnp.ndarray] = None, train: bool = True):
        if external_code is not None:
            x = self.decoder(external_code, train)
            x = x.reshape(-1, num_frames, 2, self.num_landmarks)
            return x, external_code, jnp.zeros_like(external_code)

        mu, logvar = self.encoder(poses, train)
        eps = self.make_rng("reparam")
        noise = jax.random.normal(eps, logvar.shape, dtype=logvar.dtype)
        code = mu + jnp.exp(0.5 * logvar) * noise
        x = self.decoder(code, train)
        x = x.reshape(-1, num_frames, 2, self.num_landmarks)
        return x, mu, logvar

    def encode(self, poses: jnp.ndarray, train: bool = False):
        return self.encoder(poses, train)
