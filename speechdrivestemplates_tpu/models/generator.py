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

from ..ops.resize import (conv_time_out_valid, interpolate_bilinear,
                          interpolate_bilinear_valid, interpolate_linear_time,
                          interpolate_linear_time_valid, mask_time)
from .blocks import ConvNormRelu


class AudioEncoder(nn.Module):
    """2D CNN over the mel spectrogram, resampled to the video frame rate
    (reference generator.py:8-43).

    ``stem_weights`` (inference only): the first three conv kernels, passed by
    the caller to route layers 1-3 through the fused Pallas stem kernel
    (probes/stem_pallas.py) instead of the HBM-bound XLA lowering.  Layer names
    are pinned explicitly so the parameter tree is identical on both paths.
    """

    norm: str = "IN"
    leaky: bool = True
    dtype: Any = None
    conv_mm: bool = False  # SYS.CONV_MM_GRAD: patches-matmul stem convs

    @nn.compact
    def __call__(self, mel: jnp.ndarray, num_frames: int, train: bool = True,
                 stem_weights=None, t_mel_valid=None,
                 num_frames_valid=None) -> jnp.ndarray:
        cnr = lambda i, ch, **kw: ConvNormRelu(  # noqa: E731
            conv_type="2d", out_channels=ch, norm=self.norm, leaky=self.leaky,
            dtype=self.dtype, mm_grad=self.conv_mm,
            name=f"ConvNormRelu_{i}", **kw)
        specs = [dict(ch=64), dict(ch=64, downsample=True),
                 dict(ch=128), dict(ch=128, downsample=True),
                 dict(ch=256), dict(ch=256, downsample=True),
                 dict(ch=256), dict(ch=256, kernel_size=(6, 3), stride=1, padding=0)]
        if stem_weights is not None:
            assert not train, "fused stem is an inference-only path"
            assert self.norm == "IN", "fused stem covers IN-normalized encoders"
            assert t_mel_valid is None, "fused stem is a fixed-length path"
            # only reachable when the caller resolved stem weights, which
            # itself imports probes.stem_pallas (voice2pose._stem_weights)
            from probes.stem_pallas import fused_audio_encoder_stem

            x = fused_audio_encoder_stem(
                mel, *stem_weights, slope=0.2 if self.leaky else 0.0,
                dtype=self.dtype or jnp.float32)
            start = 3
        else:
            # mel: (B, n_mels, T_mel) -> NHWC
            x = mel[..., None]
            start = 0
        v = t_mel_valid
        for i in range(start, 8):
            kw = dict(specs[i])
            ch = kw.pop("ch")
            if v is not None:
                # time components of this layer's (k, s, p); kernel tuples are
                # (H=mel, W=time) — see specs above
                if kw.get("downsample"):
                    kt, st, pt = 4, 2, 1
                elif "kernel_size" in kw:
                    kt, st, pt = kw["kernel_size"][1], kw["stride"], kw["padding"]
                else:
                    kt, st, pt = 3, 1, 1
                v = conv_time_out_valid(v, kt, st, pt)
            x = cnr(i, ch, **kw)(x, train, t_valid=v)
        # (B, H', W', 256) -> bilinear to (1, num_frames) -> (B, num_frames, 256)
        if v is not None:
            x = interpolate_bilinear_valid(x, (1, num_frames), v, num_frames_valid)
        else:
            x = interpolate_bilinear(x, (1, num_frames))
        return x[:, 0, :, :]


class UNet1D(nn.Module):
    """Temporal 1D UNet with additive skips (reference generator.py:45-85)."""

    norm: str = "IN"
    leaky: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 t_valid=None) -> jnp.ndarray:
        cnr = lambda name, down=False: ConvNormRelu(  # noqa: E731
            conv_type="1d", out_channels=256, downsample=down, norm=self.norm,
            leaky=self.leaky, dtype=self.dtype, name=name)
        if t_valid is None:
            vs = [None] * 7
        else:
            # valid length per level: downsample convs are k4 s2 p1
            vs = [t_valid, t_valid]
            for _ in range(5):
                vs.append(conv_time_out_valid(vs[-1], 4, 2, 1))
        e0 = cnr("e0")(x, train, t_valid=vs[0])
        e1 = cnr("e1")(e0, train, t_valid=vs[1])
        e2 = cnr("e2", down=True)(e1, train, t_valid=vs[2])
        e3 = cnr("e3", down=True)(e2, train, t_valid=vs[3])
        e4 = cnr("e4", down=True)(e3, train, t_valid=vs[4])
        e5 = cnr("e5", down=True)(e4, train, t_valid=vs[5])
        e6 = cnr("e6", down=True)(e5, train, t_valid=vs[6])

        if t_valid is None:
            up = lambda a, b, *_: interpolate_linear_time(a, b.shape[-2])  # noqa: E731
        else:
            up = lambda a, b, vi, vo: interpolate_linear_time_valid(  # noqa: E731
                a, b.shape[-2], vi, vo)
        d5 = cnr("d5")(up(e6, e5, vs[6], vs[5]) + e5, train, t_valid=vs[5])
        d4 = cnr("d4")(up(d5, e4, vs[5], vs[4]) + e4, train, t_valid=vs[4])
        d3 = cnr("d3")(up(d4, e3, vs[4], vs[3]) + e3, train, t_valid=vs[3])
        d2 = cnr("d2")(up(d3, e2, vs[3], vs[2]) + e2, train, t_valid=vs[2])
        d1 = cnr("d1")(up(d2, e1, vs[2], vs[1]) + e1, train, t_valid=vs[1])
        return d1


class SequenceGeneratorCNN(nn.Module):
    """AudioEncoder -> [concat clip code] -> UNet1D -> conv decoder -> (B, T, 2, K)
    (reference generator.py:87-117)."""

    num_landmarks: int = 121
    code_dim: Optional[int] = None  # CLIP_CODE.DIMENSION (None -> no code concat)
    norm: str = "IN"
    leaky: bool = True
    dtype: Any = None
    conv_mm: bool = False  # SYS.CONV_MM_GRAD: patches-matmul stem convs

    @nn.compact
    def __call__(self, mel: jnp.ndarray, num_frames: int,
                 code: Optional[jnp.ndarray] = None, train: bool = True,
                 stem_weights=None, t_mel_valid=None,
                 num_frames_valid=None) -> jnp.ndarray:
        if t_mel_valid is not None:
            # length-polymorphic eval: one bucket executable serves every clip
            # length; mel columns beyond the clip's true frames are zeroed so
            # the conv stack sees exactly the SAME-padding of an unbucketed
            # compile (tests/test_demo_bucketing.py pins the equality)
            assert num_frames_valid is not None and not train
            mel = mask_time(mel, t_mel_valid, axis=-1)
        x = AudioEncoder(norm=self.norm, leaky=self.leaky, dtype=self.dtype,
                         conv_mm=self.conv_mm,
                         name="audio_encoder")(mel, num_frames, train,
                                               stem_weights=stem_weights,
                                               t_mel_valid=t_mel_valid,
                                               num_frames_valid=num_frames_valid)

        if self.code_dim is not None:
            # code: (B, code_dim) broadcast over time, or (B, code_dim, T) frame-variant
            # (reference generator.py:109-111 tiles (B, code_dim) -> (B, code_dim, T)).
            if code.ndim == 2:
                code_t = jnp.broadcast_to(code[:, None, :],
                                          (code.shape[0], x.shape[1], code.shape[1]))
            else:
                code_t = jnp.swapaxes(code, 1, 2)  # (B, T, code_dim)
            x = jnp.concatenate([x, code_t.astype(x.dtype)], axis=-1)
            if num_frames_valid is not None:
                # the code broadcast fills invalid positions too; re-zero them
                # so the UNet's first conv sees SAME-pad zeros past the clip
                x = mask_time(x, num_frames_valid, axis=-2)

        x = UNet1D(norm=self.norm, leaky=self.leaky, dtype=self.dtype,
                   name="unet")(x, train, t_valid=num_frames_valid)

        for i in range(4):
            x = ConvNormRelu(conv_type="1d", out_channels=256, norm=self.norm,
                             leaky=self.leaky, dtype=self.dtype,
                             name=f"decoder_{i}")(x, train,
                                                  t_valid=num_frames_valid)
        x = nn.Conv(self.num_landmarks * 2, kernel_size=(1,), use_bias=True,
                    dtype=self.dtype, name="decoder_out")(x)

        # (B, T, 2K) -> (B, T, 2, K); reference reshapes the channel axis the same way
        # after its permute (generator.py:116).
        B = x.shape[0]
        return x.reshape(B, num_frames, 2, self.num_landmarks)
