"""AOT export of the wav->pose serving function (``jax.export`` / StableHLO).

Production serving should not require the Python model code: this module
serializes the complete jitted inference graph — mel frontend + generator +
per-speaker denormalization to pixel space, with the checkpoint's weights and
the speaker statistics baked in as constants — into a portable artifact that
any JAX runtime (same or newer jaxlib) can deserialize and call, on TPU
serving hosts or CPU boxes, with zero framework imports.

The reference has no serving story beyond re-running the demo script against
a checkpoint (``/root/reference/core/pipelines/trainer.py:459-484``); this is
the TPU-era extension of that capability.  Shapes are static by design (XLA
serving contract): one artifact per (batch, audio-length) serving point —
export several if the fleet serves several.

Artifact layout: ``<path>`` is the serialized StableHLO blob,
``<path>.json`` a human-readable sidecar with the calling convention.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_serving_fn(cfg, params_g, batch_stats_g) -> Tuple[Callable, bool]:
    """``(fn, has_code)``: a pure ``fn(audio[, code]) -> poses`` closure over
    the given weights, plus whether the model takes a template code input.

    audio: (B, audio_length) float32 waveform at 16 kHz;
    code:  (B, code_dim) float32 template code (omitted for code-free models);
    returns (B, num_frames, 2, num_landmarks) float32 poses in pixel space
    (denormalized with the configured speaker's statistics, re-rooted to
    global coordinates when DATASET.HIERARCHICAL_POSE).
    """
    from ..datasets.speakers_stat import get_speaker_stat
    from ..models import build_model
    from ..ops import pose as pose_ops
    from ..ops.mel import mel_spectrogram

    gen = build_model(cfg.VOICE2POSE.GENERATOR.NAME, cfg)
    has_code = cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION is not None
    num_frames = cfg.DATASET.NUM_FRAMES
    hierarchical = cfg.DATASET.HIERARCHICAL_POSE
    num_kp = cfg.DATASET.NUM_LANDMARKS
    stat = get_speaker_stat(cfg.DATASET.SPEAKER, num_kp, hierarchical)
    mean = jnp.asarray(stat["mean"], jnp.float32)[None]
    std = jnp.asarray(stat["std"], jnp.float32)[None]
    scale = jnp.asarray([stat["scale_factor"]], jnp.float32)
    # 'auto' resolves against the EXPORTING host's backend; pin the
    # platform-agnostic MXU matmul formulation instead
    mel_impl = cfg.SYS.MEL_IMPL if cfg.SYS.MEL_IMPL != "auto" else "dft2"

    variables = {"params": params_g}
    if batch_stats_g:
        variables["batch_stats"] = batch_stats_g

    def fn(audio, code=None):
        B = audio.shape[0]
        mel = mel_spectrogram(audio, impl=mel_impl)
        pred = gen.apply(variables, mel, num_frames,
                         code if has_code else None, False)
        return pose_ops.get_final_results(
            pred, jnp.broadcast_to(mean, (B, mean.shape[1])),
            jnp.broadcast_to(std, (B, std.shape[1])),
            jnp.broadcast_to(scale, (B,)), hierarchical, num_kp)

    return fn, has_code


def export_serving_fn(cfg, checkpoint: str, out_path: str,
                      batch_size: int = 1,
                      audio_length: Optional[int] = None,
                      platforms: Optional[tuple] = ("cpu", "tpu"),
                      pipeline=None) -> dict:
    """Load ``checkpoint`` and write the serialized serving artifact.

    ``platforms`` defaults to ``("cpu", "tpu")`` so the artifact is portable
    regardless of which host ran the export (jax.export locks the artifact to
    the lowering platforms; exporting TPU-only from a TPU trainer would make
    it uncallable on a CPU serving box).  Pass ``None`` to lock it to the
    exporting host's backend, or an explicit tuple to choose.

    ``pipeline`` reuses an already-constructed Voice2Pose pipeline (e.g. the
    one ``main.py`` built); omitted, one is created from ``cfg``.

    Returns the sidecar metadata dict (also written to ``<out_path>.json``).
    """
    from ..pipelines import get_pipeline

    assert cfg.PIPELINE_TYPE == "Voice2Pose", (
        "serving export is the wav->pose path; Pose2Pose has no audio input")
    pipe = pipeline if pipeline is not None else get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    # no dataset at export time: the clip-code bank's size comes from the
    # checkpoint itself (it only shapes the bank; serving passes codes in)
    if pipe._is_torch_pth(checkpoint):
        # a reference-published .pth exports to a serving artifact directly
        from .torch_import import load_torch_state_dict

        sd = load_torch_state_dict(checkpoint)
        pipe.num_train_samples = (int(np.shape(sd["clips_code"])[0])
                                  if "clips_code" in sd else 1)
        pipe.setup_model(cfg)
        pipe.load_torch_pth(checkpoint)
    else:
        tree = pipe.load_checkpoint_tree(checkpoint)
        state = tree["state"]
        pipe.num_train_samples = (int(np.shape(state["clips_code"])[0])
                                  if "clips_code" in state else 1)
        pipe.setup_model(cfg)
        pipe.load_state(state, load_optimizers=False)

    audio_length = audio_length or cfg.DATASET.AUDIO_LENGTH
    fn, has_code = build_serving_fn(
        cfg, jax.device_get(pipe.state["params_g"]),
        jax.device_get(pipe.state.get("batch_stats_g") or {}))

    args = [jax.ShapeDtypeStruct((batch_size, audio_length), jnp.float32)]
    code_dim = cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION
    if has_code:
        args.append(jax.ShapeDtypeStruct((batch_size, code_dim), jnp.float32))

    exported = jax.export.export(
        jax.jit(fn), platforms=platforms)(*args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)

    meta = {
        "format": "jax.export StableHLO",
        "pipeline": cfg.PIPELINE_TYPE,
        "speaker": cfg.DATASET.SPEAKER,
        "batch_size": batch_size,
        "audio_length": audio_length,
        "sample_rate": 16000,
        "num_frames": cfg.DATASET.NUM_FRAMES,
        "num_landmarks": cfg.DATASET.NUM_LANDMARKS,
        "code_dim": code_dim if has_code else None,
        "inputs": (["audio f32[B,L]", "code f32[B,D]"] if has_code
                   else ["audio f32[B,L]"]),
        "output": "poses f32[B,T,2,K] (pixel space)",
        "platforms": list(exported.platforms),
        "checkpoint": os.path.abspath(checkpoint),
        "jax_version": jax.__version__,
        "bytes": len(blob),
    }
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_serving_fn(path: str) -> Callable:
    """Deserialize an exported artifact; the result is callable directly (and
    under ``jax.jit``) with the shapes recorded in the sidecar."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return exported.call
