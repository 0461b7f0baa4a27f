"""Audio -> pose-sequence generator.

Reference: ``core/networks/keypoints_generation/generator.py`` (AudioEncoder:8-43,
UNet_1D:45-85, SequenceGeneratorCNN:87-117).  TPU-first re-design:
  - mel input is (B, n_mels, T_mel); internally NHWC (B, 80, T_mel, 1) so the 2D conv
    stack maps straight onto the MXU.
  - the audio-rate -> video-rate resample (reference F.interpolate bilinear,
    generator.py:41) happens with static shapes: ``num_frames`` is a Python int at
    trace time; variable-length demo audio compiles one executable per length bucket.
  - 1D tensors are (B, T, C); the UNet's upsample+skip additions are linear resizes
    with torch align_corners=False semantics (ops/resize.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import interpolate_bilinear, interpolate_linear_time
from .blocks import ConvNormRelu


class AudioEncoder(nn.Module):
    """2D CNN over the mel spectrogram, resampled to the video frame rate
    (reference generator.py:8-43).

    ``stem_weights`` (inference only): the first three conv kernels, passed by
    the caller to route layers 1-3 through the fused Pallas stem kernel
    (ops/stem_pallas.py) instead of the HBM-bound XLA lowering.  Layer names
    are pinned explicitly so the parameter tree is identical on both paths.
    """

    norm: str = "IN"
    leaky: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray, num_frames: int, train: bool = True,
                 stem_weights=None) -> jnp.ndarray:
        cnr = lambda i, ch, **kw: ConvNormRelu(  # noqa: E731
            conv_type="2d", out_channels=ch, norm=self.norm, leaky=self.leaky,
            dtype=self.dtype, name=f"ConvNormRelu_{i}", **kw)
        specs = [dict(ch=64), dict(ch=64, downsample=True),
                 dict(ch=128), dict(ch=128, downsample=True),
                 dict(ch=256), dict(ch=256, downsample=True),
                 dict(ch=256), dict(ch=256, kernel_size=(6, 3), stride=1, padding=0)]
        if stem_weights is not None:
            assert not train, "fused stem is an inference-only path"
            assert self.norm == "IN", "fused stem covers IN-normalized encoders"
            from ..ops.stem_pallas import fused_audio_encoder_stem

            x = fused_audio_encoder_stem(
                mel, *stem_weights, slope=0.2 if self.leaky else 0.0,
                dtype=self.dtype or jnp.float32)
            start = 3
        else:
            # mel: (B, n_mels, T_mel) -> NHWC
            x = mel[..., None]
            start = 0
        for i in range(start, 8):
            kw = dict(specs[i])
            ch = kw.pop("ch")
            x = cnr(i, ch, **kw)(x, train)
        # (B, H', W', 256) -> bilinear to (1, num_frames) -> (B, num_frames, 256)
        x = interpolate_bilinear(x, (1, num_frames))
        return x[:, 0, :, :]


class UNet1D(nn.Module):
    """Temporal 1D UNet with additive skips (reference generator.py:45-85)."""

    norm: str = "IN"
    leaky: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        cnr = lambda name, down=False: ConvNormRelu(  # noqa: E731
            conv_type="1d", out_channels=256, downsample=down, norm=self.norm,
            leaky=self.leaky, dtype=self.dtype, name=name)
        e0 = cnr("e0")(x, train)
        e1 = cnr("e1")(e0, train)
        e2 = cnr("e2", down=True)(e1, train)
        e3 = cnr("e3", down=True)(e2, train)
        e4 = cnr("e4", down=True)(e3, train)
        e5 = cnr("e5", down=True)(e4, train)
        e6 = cnr("e6", down=True)(e5, train)

        d5 = cnr("d5")(interpolate_linear_time(e6, e5.shape[-2]) + e5, train)
        d4 = cnr("d4")(interpolate_linear_time(d5, e4.shape[-2]) + e4, train)
        d3 = cnr("d3")(interpolate_linear_time(d4, e3.shape[-2]) + e3, train)
        d2 = cnr("d2")(interpolate_linear_time(d3, e2.shape[-2]) + e2, train)
        d1 = cnr("d1")(interpolate_linear_time(d2, e1.shape[-2]) + e1, train)
        return d1


class SequenceGeneratorCNN(nn.Module):
    """AudioEncoder -> [concat clip code] -> UNet1D -> conv decoder -> (B, T, 2, K)
    (reference generator.py:87-117)."""

    num_landmarks: int = 121
    code_dim: Optional[int] = None  # CLIP_CODE.DIMENSION (None -> no code concat)
    norm: str = "IN"
    leaky: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray, num_frames: int,
                 code: Optional[jnp.ndarray] = None, train: bool = True,
                 stem_weights=None) -> jnp.ndarray:
        x = AudioEncoder(norm=self.norm, leaky=self.leaky, dtype=self.dtype,
                         name="audio_encoder")(mel, num_frames, train,
                                               stem_weights=stem_weights)

        if self.code_dim is not None:
            # code: (B, code_dim) broadcast over time, or (B, code_dim, T) frame-variant
            # (reference generator.py:109-111 tiles (B, code_dim) -> (B, code_dim, T)).
            if code.ndim == 2:
                code_t = jnp.broadcast_to(code[:, None, :],
                                          (code.shape[0], x.shape[1], code.shape[1]))
            else:
                code_t = jnp.swapaxes(code, 1, 2)  # (B, T, code_dim)
            x = jnp.concatenate([x, code_t.astype(x.dtype)], axis=-1)

        x = UNet1D(norm=self.norm, leaky=self.leaky, dtype=self.dtype, name="unet")(x, train)

        for i in range(4):
            x = ConvNormRelu(conv_type="1d", out_channels=256, norm=self.norm,
                             leaky=self.leaky, dtype=self.dtype,
                             name=f"decoder_{i}")(x, train)
        x = nn.Conv(self.num_landmarks * 2, kernel_size=(1,), use_bias=True,
                    dtype=self.dtype, name="decoder_out")(x)

        # (B, T, 2K) -> (B, T, 2, K); reference reshapes the channel axis the same way
        # after its permute (generator.py:116).
        B = x.shape[0]
        return x.reshape(B, num_frames, 2, self.num_landmarks)
