"""Time-axis sequence parallelism for the generator (conv-net context parallelism).

The reference handles long demo audio with ONE dense forward and therefore caps
input length at 24 s (reference configs/default.py:54, gesture_dataset.py:62-66).
Round 1 shipped DEMO.WINDOWED crossfade stitching (approximate: per-window
InstanceNorm statistics).  This module is the EXACT answer: shard the time axis
of the whole generator across the device mesh with ``jax.shard_map``:

  - convolutions exchange halos with ``lax.ppermute`` (global zero padding
    appears as zero halos on the edge shards; stride-2 layers stay phase-
    aligned because shard lengths are multiples of the network's total stride);
  - the torch-exact interpolation resizes (ops/resize.py) become per-shard
    BANDED slices of the global interpolation matrix, stacked over shards and
    selected by ``lax.axis_index`` — edge clamping is encoded exactly;
  - the audio encoder's InstanceNorm-2d normalizes over (H, global-time), so
    its statistics are ``psum``'d across shards (with masking for the garbage
    tail columns the VALID (6,3) conv produces on the last shard); the IN-1d
    "permute quirk" norm (per-position channel norm) and BN-eval are local.

The result is bit-comparable (fp32 ~1e-5) to the dense ``SequenceGeneratorCNN``
forward at ANY length — tested shard-vs-dense in tests/test_seqparallel.py.

Reference architecture being parallelized: core/networks/keypoints_generation/
generator.py (AudioEncoder:8-43, UNet_1D:45-85, SequenceGeneratorCNN:87-117).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.resize import _precision_for, _resize_matrix

AXIS = "data"  # the 1-D mesh axis the time dimension is sharded over


# ---------------------------------------------------------------------------
# halo exchange
# ---------------------------------------------------------------------------

def _halo(x: jnp.ndarray, left: int, right: int, axis: int) -> jnp.ndarray:
    """Concatenate ``left``/``right`` neighbor columns along ``axis``; edge
    shards receive zeros (== the reference convs' zero padding)."""
    n = lax.psum(1, AXIS)
    idx = lax.axis_index(AXIS)
    parts = []
    if left:
        edge = lax.slice_in_dim(x, x.shape[axis] - left, x.shape[axis], axis=axis)
        recv = lax.ppermute(edge, AXIS, [(i, (i + 1) % n) for i in range(n)])
        parts.append(jnp.where(idx == 0, jnp.zeros_like(recv), recv))
    parts.append(x)
    if right:
        edge = lax.slice_in_dim(x, 0, right, axis=axis)
        recv = lax.ppermute(edge, AXIS, [(i, (i - 1) % n) for i in range(n)])
        parts.append(jnp.where(idx == n - 1, jnp.zeros_like(recv), recv))
    return jnp.concatenate(parts, axis=axis)


# ---------------------------------------------------------------------------
# sharded torch-exact resize: per-shard banded matrices
# ---------------------------------------------------------------------------

def make_sharded_resize(in_len: int, out_len: int, n: int,
                        valid_src: Optional[int] = None):
    """Per-shard slices of the global (out_len, in_len) interpolation matrix.

    Returns (stacked (n, out_l, in_l + 2*halo) float32 array, halo).  When
    ``valid_src`` < in_len the trailing source columns are garbage (VALID-conv
    tail) and their weights are zero by construction.
    """
    assert in_len % n == 0 and out_len % n == 0, (in_len, out_len, n)
    in_l, out_l = in_len // n, out_len // n
    src_cols = in_len if valid_src is None else valid_src
    if src_cols <= 0:
        raise ValueError(
            f"no valid source columns to resize from (valid_src={valid_src}): "
            f"the clip is too short for a {n}-way sequence-parallel forward")
    W = _resize_matrix(src_cols, out_len)  # (out_len, src_cols)
    if src_cols < in_len:
        W = np.concatenate(
            [W, np.zeros((out_len, in_len - src_cols), np.float32)], axis=1)

    # minimal halo: max overhang of any shard's rows beyond its own columns
    halo = 0
    for s in range(n):
        rows = W[s * out_l:(s + 1) * out_l]
        cols = np.nonzero(np.abs(rows).sum(axis=0) > 0)[0]
        if len(cols):
            halo = max(halo, s * in_l - cols.min(), cols.max() - ((s + 1) * in_l - 1))
    halo = int(max(halo, 0))
    if halo > in_l:
        # _halo only exchanges with ADJACENT shards, so a halo wider than one
        # shard cannot be satisfied — happens when the clip is much shorter
        # than the mesh is wide
        raise ValueError(
            f"sequence-parallel halo ({halo}) exceeds the per-shard width "
            f"({in_l}) for a {n}-way resize {in_len}->{out_len}: the clip is "
            "too short to shard this many ways — use the dense demo path "
            "(DEMO.SEQUENCE_PARALLEL False) or fewer devices")

    mats = np.zeros((n, out_l, in_l + 2 * halo), np.float32)
    for s in range(n):
        lo, hi = s * in_l - halo, (s + 1) * in_l + halo
        src = W[s * out_l:(s + 1) * out_l, max(lo, 0):min(hi, in_len)]
        dst_lo = max(lo, 0) - lo
        mats[s, :, dst_lo:dst_lo + src.shape[1]] = src
    return jnp.asarray(mats), halo


def sharded_resize_time(x: jnp.ndarray, mats: jnp.ndarray, halo: int,
                        time_axis: int) -> jnp.ndarray:
    """Apply a make_sharded_resize result along ``time_axis`` of x."""
    x_ext = _halo(x, halo, halo, time_axis) if halo else x
    M = mats[lax.axis_index(AXIS)]
    x_moved = jnp.moveaxis(x_ext, time_axis, -2)  # (..., T_ext, C)
    out = jnp.einsum("ot,...tc->...oc", M.astype(x.dtype), x_moved,
                     precision=_precision_for(x))
    return jnp.moveaxis(out, -2, time_axis)


# ---------------------------------------------------------------------------
# sharded conv + norms
# ---------------------------------------------------------------------------

def _conv_time(x: jnp.ndarray, kernel: jnp.ndarray, stride: int, pad: int,
               time_axis: int, h_pad: Optional[int] = None) -> jnp.ndarray:
    """Conv with zero padding ``pad`` along GLOBAL time (as halos), VALID local.

    x: 1d (B, T, C) with time_axis=1 and kernel (k, Cin, Cout), or
       2d (B, H, W, C) with time_axis=2 and kernel (kh, kw, Cin, Cout)
       (``h_pad`` pads H locally).
    """
    k_t = kernel.shape[0] if time_axis == 1 else kernel.shape[1]
    # halo sizes replicate the global zero padding; with stride s and pad p,
    # shard-aligned outputs need (p, k_t - 1 - p) extra columns
    x_ext = _halo(x, pad, k_t - 1 - pad, time_axis)
    if time_axis == 1:
        return lax.conv_general_dilated(
            x_ext, kernel, (stride,), "VALID",
            dimension_numbers=("NHC", "HIO", "NHC"))
    return lax.conv_general_dilated(
        x_ext, kernel, (stride, stride),
        [(h_pad, h_pad), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _instance_norm_2d_global(x: jnp.ndarray, valid_mask: jnp.ndarray,
                             eps: float = 1e-5) -> jnp.ndarray:
    """IN-2d over (H, GLOBAL W) per (B, C): psum'd masked statistics.
    x: (B, H, Wl, C); valid_mask: (Wl,) in {0,1}."""
    m = valid_mask[None, None, :, None]
    cnt = lax.psum(jnp.sum(m) * x.shape[1], AXIS)
    s1 = lax.psum(jnp.sum(x * m, axis=(1, 2), keepdims=True), AXIS)
    mean = s1 / cnt
    s2 = lax.psum(jnp.sum((x - mean) ** 2 * m, axis=(1, 2), keepdims=True), AXIS)
    var = s2 / cnt
    return (x - mean) * lax.rsqrt(var + eps) * m  # garbage cols -> 0


def _pos_channel_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """The reference's IN-1d permute quirk: normalize channels per position."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def _act(x: jnp.ndarray, leaky: bool) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, 0.2) if leaky else jax.nn.relu(x)


def _bn_eval(x: jnp.ndarray, norm_params, norm_stats,
             eps: float = 1e-5) -> jnp.ndarray:
    """Eval-mode BatchNorm = per-channel affine from running stats (LOCAL —
    no cross-shard communication needed, unlike InstanceNorm-2d)."""
    mean, var = norm_stats["mean"], norm_stats["var"]
    scale, bias = norm_params["scale"], norm_params["bias"]
    y = (x - mean) * lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# the sequence-parallel generator forward
# ---------------------------------------------------------------------------

AE_LAYOUT = [  # (name, stride, pad) of the audio encoder 2D stack
    ("ConvNormRelu_0", 1, 1), ("ConvNormRelu_1", 2, 1),
    ("ConvNormRelu_2", 1, 1), ("ConvNormRelu_3", 2, 1),
    ("ConvNormRelu_4", 1, 1), ("ConvNormRelu_5", 2, 1),
    ("ConvNormRelu_6", 1, 1),
]


def _generator_seq_forward(params: Dict[str, Any], batch_stats,
                           mel: jnp.ndarray,
                           code: Optional[jnp.ndarray], resize_ae, resize_up,
                           leaky: bool, norm: str = "IN") -> jnp.ndarray:
    """Shard-local generator forward (runs under shard_map).

    mel: (B, 80, T_mel_local); code: (B, code_dim) replicated or None.
    resize_ae: (mats, halo) for the audio-encoder grid -> frame grid;
    resize_up: dict level -> (mats, halo) for the UNet upsamples.
    norm: 'IN' (psum'd IN-2d + per-position channel norm) or 'BN'
    (eval-mode running-stat affine from ``batch_stats`` — s2g checkpoints).
    Returns (B, T_local, 2, K).
    """
    ae = params["audio_encoder"]
    ae_stats = (batch_stats or {}).get("audio_encoder", {})
    # match models/generator.py: mel (B, n_mels, T) -> NHWC (B, 80, T, 1)
    x = mel[..., None]  # (B, 80, T_mel_l, 1)

    for name, stride, pad in AE_LAYOUT:
        k = ae[name]["conv"]["kernel"]
        x = _conv_time(x, k, stride, pad, time_axis=2, h_pad=pad)
        if norm == "BN":
            x = _bn_eval(x, ae[name]["norm"], ae_stats[name]["norm"])
        else:
            x = _instance_norm_2d_global(x, jnp.ones((x.shape[2],), x.dtype))
        x = _act(x, leaky)

    # (6,3) VALID conv: halo(0,2); last shard's last 2 columns are garbage
    k = ae["ConvNormRelu_7"]["conv"]["kernel"]
    x_ext = _halo(x, 0, 2, axis=2)
    x = lax.conv_general_dilated(x_ext, k, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n = lax.psum(1, AXIS)
    idx = lax.axis_index(AXIS)
    wl = x.shape[2]
    col = lax.iota(jnp.int32, wl)
    mask = jnp.where(idx == n - 1, (col < wl - 2), jnp.ones((wl,), bool))
    mask = mask.astype(x.dtype)
    if norm == "BN":
        x = _bn_eval(x, ae["ConvNormRelu_7"]["norm"],
                     ae_stats["ConvNormRelu_7"]["norm"])
    else:
        x = _instance_norm_2d_global(x, mask)
    x = _act(x, leaky) * mask[None, None, :, None]

    # bilinear (H' -> 1, W' -> T): H part is a local matmul; W part is the
    # sharded banded resize (whose matrix already ignores the garbage columns)
    Wh = jnp.asarray(_resize_matrix(x.shape[1], 1), x.dtype)  # (1, H')
    x = jnp.einsum("oh,bhwc->bowc", Wh, x,
                   precision=_precision_for(x))[:, 0]  # (B, Wl', C)
    x = sharded_resize_time(x, *resize_ae, time_axis=1)  # (B, T_l, 256)

    if code is not None:
        code_t = jnp.broadcast_to(code[:, None, :].astype(x.dtype),
                                  (code.shape[0], x.shape[1], code.shape[1]))
        x = jnp.concatenate([x, code_t], axis=-1)

    unet = params["unet"]
    e0_in = unet["e0"]["conv"]["kernel"].shape[1]
    if x.shape[-1] != e0_in:
        raise ValueError(
            f"generator expects {e0_in} UNet input channels but got "
            f"{x.shape[-1]}: pass `code` iff the checkpoint was trained with "
            "CLIP_CODE.DIMENSION set (and with the same dimension)")

    def cnr1d(x, p, stride, pad, stats=None):
        x = _conv_time(x, p["conv"]["kernel"], stride, pad, time_axis=1)
        if norm == "BN":
            x = _bn_eval(x, p["norm"], stats["norm"])
        else:
            x = _pos_channel_norm(x)
        return _act(x, leaky)

    un_stats = (batch_stats or {}).get("unet", {})
    e0 = cnr1d(x, unet["e0"], 1, 1, un_stats.get("e0"))
    e1 = cnr1d(e0, unet["e1"], 1, 1, un_stats.get("e1"))
    e2 = cnr1d(e1, unet["e2"], 2, 1, un_stats.get("e2"))
    e3 = cnr1d(e2, unet["e3"], 2, 1, un_stats.get("e3"))
    e4 = cnr1d(e3, unet["e4"], 2, 1, un_stats.get("e4"))
    e5 = cnr1d(e4, unet["e5"], 2, 1, un_stats.get("e5"))
    e6 = cnr1d(e5, unet["e6"], 2, 1, un_stats.get("e6"))

    d = e6
    for lvl, (name, skip) in enumerate(
            [("d5", e5), ("d4", e4), ("d3", e3), ("d2", e2), ("d1", e1)]):
        d = sharded_resize_time(d, *resize_up[lvl], time_axis=1) + skip
        d = cnr1d(d, unet[name], 1, 1, un_stats.get(name))

    for i in range(4):
        d = cnr1d(d, params[f"decoder_{i}"], 1, 1,
                  (batch_stats or {}).get(f"decoder_{i}"))
    return d  # decoder_out (k=1 conv) is applied by the caller


def _decoder_out_matmul(x, kernel, bias):
    return jnp.einsum("btc,co->bto", x, kernel[0].astype(x.dtype)) + bias.astype(x.dtype)


@functools.lru_cache(maxsize=16)
def _build_seq_forward(mesh: Mesh, t_mel: int, num_frames: int,
                       with_code: bool, leaky: bool, num_landmarks: int,
                       norm: str = "IN"):
    """Jitted sharded forward for one (shape, mesh) configuration — cached so
    repeated demo clips of the same padded shape reuse the compiled program
    (remote TPU compiles cost minutes)."""
    n = mesh.size
    w_valid = t_mel // 8 - 2  # audio-encoder grid after 3 downsamples + VALID
    resize_ae = make_sharded_resize(t_mel // 8, num_frames, n,
                                    valid_src=w_valid)
    resize_up = {}
    t = num_frames // 32
    for lvl in range(5):
        resize_up[lvl] = make_sharded_resize(t, 2 * t, n)
        t *= 2

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(None, None, AXIS)) + ((P(),) if with_code else ()),
        out_specs=P(None, AXIS))
    def run(params, batch_stats, mel_l, *maybe_code):
        c = maybe_code[0] if maybe_code else None
        x = _generator_seq_forward(params, batch_stats, mel_l, c, resize_ae,
                                   resize_up, leaky, norm)
        out = params["decoder_out"]
        x = _decoder_out_matmul(x, out["kernel"], out["bias"])
        B, Tl = x.shape[0], x.shape[1]
        return x.reshape(B, Tl, 2, num_landmarks)

    return jax.jit(run)


def generator_seq_parallel(mesh: Mesh, params: Dict[str, Any], mel: np.ndarray,
                           num_frames: int, code: Optional[np.ndarray],
                           leaky: bool = True,
                           num_landmarks: int = 121, norm: str = "IN",
                           batch_stats: Optional[Dict[str, Any]] = None
                           ) -> jnp.ndarray:
    """Dense-equivalent SequenceGeneratorCNN forward with the time axis sharded
    over ``mesh``.  mel: (B, 80, T_mel) host array; returns (B, T, 2, K).

    Constraints (asserted): T_mel divisible by 8*n, num_frames by 32*n.
    """
    n = mesh.size
    B, n_mels, t_mel = mel.shape
    assert t_mel % (8 * n) == 0, (t_mel, n)
    assert num_frames % (32 * n) == 0, (num_frames, n)

    if norm not in ("BN", "IN"):
        # every `norm == "BN"` branch below silently falls through to the
        # InstanceNorm path otherwise — a typo'd norm must fail loudly
        raise ValueError(f"unknown norm {norm!r}; expected 'BN' or 'IN'")
    if norm == "BN" and not batch_stats:
        raise ValueError("norm='BN' needs the generator's batch_stats "
                         "(running mean/var) for eval-mode BatchNorm")
    sh = NamedSharding(mesh, P(None, None, AXIS))
    if jax.process_count() > 1:
        # multi-process mesh: every process holds the FULL mel (demo audio is
        # host-replicated); serve each addressable shard from the local copy
        mel_np = np.asarray(mel)
        mel_sh = jax.make_array_from_callback(mel_np.shape, sh,
                                              lambda idx: mel_np[idx])
    else:
        mel_sh = jax.device_put(jnp.asarray(mel), sh)
    run = _build_seq_forward(mesh, t_mel, num_frames, code is not None,
                             leaky, num_landmarks, norm)
    args = (params, batch_stats or {}, mel_sh) + (
        () if code is None else (jnp.asarray(code),))
    out = run(*args)
    if jax.process_count() > 1:
        # the time-sharded output spans processes (non-addressable shards are
        # not host-readable); reshard to fully replicated — the pose tensor
        # is tiny (B x T x 2 x K), so the gather costs nothing real
        out = jax.jit(lambda x: x,
                      out_shardings=NamedSharding(mesh, P()))(out)
    return out
