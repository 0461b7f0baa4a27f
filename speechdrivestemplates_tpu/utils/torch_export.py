"""Export our orbax/Flax checkpoints as reference-format PyTorch ``.pth`` files.

The inverse of ``torch_import.py``: users collaborating with someone running
the reference implementation (``ShenhanQian/SpeechDrivesTemplates``) can train
here and hand back a checkpoint the reference's ``--checkpoint`` /
``--pretrain_from`` paths load directly (reference ``trainer.py:305-321``
format: ``{epoch, step, model_state_dict}``).

Mechanics (mirror images of the importer's):
  - conv kernels transpose WIO -> OIW (1d) / HWIO -> OIHW (2d);
  - norm ``{scale, bias}`` -> ``{weight, bias}``; batch_stats ``{mean, var}``
    -> ``{running_mean, running_var}`` (+ a zero ``num_batches_tracked`` so
    ``strict=True`` loading of BatchNorm modules succeeds);
  - module-path mapping is NAME-BASED via per-architecture reverse
    translators (inverses of ``torch_import.translate_*``);
  - ``mel_transfm`` buffers (``spectrogram.window``, ``mel_scale.fb``) are
    emitted so ``Voice2PoseModel.load_state_dict(strict=True)`` finds every
    key under torchaudio 0.7 (the reference's pin); other torchaudio versions
    may lay the buffers out differently — load with ``strict=False`` there
    (the reference exposes this as ``TRAIN.STRICT_LOADING``).

Optimizer states are NOT exported: torch Adam state is keyed by parameter
*order* within each param-group, which has no stable correspondence to a
functional optax tree.  Exported checkpoints serve eval/demo/--pretrain_from;
to continue *training* in the reference, restart its optimizers.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

Path = Tuple[str, ...]


def _conv_to_torch(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w)
    if w.ndim == 3:  # (W, I, O) -> (O, I, W)
        return np.transpose(w, (2, 1, 0))
    if w.ndim == 4:  # (H, W, I, O) -> (O, I, H, W)
        return np.transpose(w, (3, 2, 0, 1))
    raise ValueError(f"unexpected conv kernel ndim {w.ndim}")


# ---------------------------------------------------------------------------
# flax-param-path -> torch-module-path reverse translators (inverses of
# torch_import.translate_*; see those for the reference layouts).
# ---------------------------------------------------------------------------

def reverse_generator(path: Path) -> str:
    if path[0] == "audio_encoder":
        n = int(path[1].rsplit("_", 1)[1])
        return f"audio_encoder.specgram_encoder_2d.{n // 2}.{n % 2}"
    if path[0] == "unet":
        return f"unet.{path[1]}"
    if path[0].startswith("decoder_"):
        tail = path[0].rsplit("_", 1)[1]
        return f"decoder.{4 if tail == 'out' else int(tail)}"
    raise KeyError(f"unmapped generator path {path}")


def reverse_discriminator(path: Path) -> str:
    if path[0].startswith("ConvNormRelu_"):
        return f"seq.{int(path[0].rsplit('_', 1)[1])}"
    if path[0] == "Conv_0":
        return "seq.3"
    raise KeyError(f"unmapped discriminator path {path}")


def reverse_pose_encoder(path: Path) -> str:
    if path[0].startswith("ConvNormRelu_"):
        return f"blocks.{int(path[0].rsplit('_', 1)[1])}"
    raise KeyError(f"unmapped pose-encoder path {path}")


def reverse_autoencoder(path: Path) -> str:
    if path[0] == "encoder":
        return "encoder." + reverse_pose_encoder(path[1:])
    if path[0] == "decoder":
        sub = path[1]
        if sub in ("d5", "d4", "d3", "d2", "d1"):
            return f"decoder.{sub}"
        if sub.startswith("block_"):
            return f"decoder.blocks.{int(sub.rsplit('_', 1)[1])}"
        if sub == "out":
            return "decoder.blocks.4"
    raise KeyError(f"unmapped autoencoder path {path}")


def _stats_node(batch_stats: Optional[Dict[str, Any]], path: Path):
    node = batch_stats
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node if isinstance(node, dict) else None


def export_module_params(params: Dict[str, Any],
                         batch_stats: Optional[Dict[str, Any]],
                         torch_prefix: str,
                         reverse: Callable[[Path], str]) -> Dict[str, np.ndarray]:
    """Walk a module's param tree and emit reference-keyed numpy tensors."""
    sd: Dict[str, np.ndarray] = {}

    def visit(path: Path, node: Any):
        if not isinstance(node, dict):
            return
        if "conv" in node or "norm" in node:  # a ConvNormRelu parent
            tparent = reverse(path)
            conv = node.get("conv")
            if conv is not None:
                sd[f"{torch_prefix}{tparent}.conv.weight"] = _conv_to_torch(
                    conv["kernel"])
                if "bias" in conv:
                    sd[f"{torch_prefix}{tparent}.conv.bias"] = np.asarray(
                        conv["bias"])
            norm = node.get("norm")
            if norm is not None:
                sd[f"{torch_prefix}{tparent}.norm.weight"] = np.asarray(
                    norm["scale"])
                sd[f"{torch_prefix}{tparent}.norm.bias"] = np.asarray(
                    norm["bias"])
            stats = _stats_node(batch_stats, path + ("norm",))
            if stats is not None:
                sd[f"{torch_prefix}{tparent}.norm.running_mean"] = np.asarray(
                    stats["mean"])
                sd[f"{torch_prefix}{tparent}.norm.running_var"] = np.asarray(
                    stats["var"])
                sd[f"{torch_prefix}{tparent}.norm.num_batches_tracked"] = (
                    np.asarray(0, dtype=np.int64))
            return
        if "kernel" in node:  # a plain final conv (no norm wrapper)
            tparent = reverse(path)
            sd[f"{torch_prefix}{tparent}.weight"] = _conv_to_torch(node["kernel"])
            if "bias" in node:
                sd[f"{torch_prefix}{tparent}.bias"] = np.asarray(node["bias"])
            return
        for k, v in node.items():
            visit(path + (k,), v)

    visit((), params)
    assert sd, f"nothing exported for prefix {torch_prefix!r}"
    return sd


def _mel_buffers(prefix: str = "mel_transfm.") -> Dict[str, np.ndarray]:
    from ..ops.mel import mel_filterbank

    window = np.hanning(401)[:400].astype(np.float32)  # periodic hann(400)
    fb = np.asarray(mel_filterbank(), dtype=np.float32)  # (257, 80)
    return {f"{prefix}spectrogram.window": window,
            f"{prefix}mel_scale.fb": fb}


def _host(tree):
    import jax

    return jax.tree.map(np.asarray, jax.device_get(tree))


def export_voice2pose(state: Dict[str, Any],
                      include_mel_buffers: bool = True) -> Dict[str, np.ndarray]:
    """Pipeline state -> reference ``Voice2PoseModel.state_dict()`` mapping
    (attribute names from reference voice2pose.py:27-77)."""
    sd: Dict[str, np.ndarray] = {}
    if include_mel_buffers:
        sd.update(_mel_buffers())
    sd.update(export_module_params(
        _host(state["params_g"]), _host(state.get("batch_stats_g") or {}),
        "netG.", reverse_generator))
    if state.get("clips_code") is not None:
        sd["clips_code"] = np.asarray(_host(state["clips_code"]))
    if state.get("params_d"):
        sd.update(export_module_params(
            _host(state["params_d"]), _host(state.get("batch_stats_d") or {}),
            "netD_pose.", reverse_discriminator))
    if state.get("params_pe"):
        sd.update(export_module_params(
            _host(state["params_pe"]), _host(state.get("batch_stats_pe") or {}),
            "pose_encoder.", reverse_pose_encoder))
    return sd


def export_pose2pose(state: Dict[str, Any],
                     include_mel_buffers: bool = True) -> Dict[str, np.ndarray]:
    """Pipeline state -> reference ``Pose2PoseModel.state_dict()`` mapping
    (attribute names from reference pose2pose.py:25-36)."""
    sd: Dict[str, np.ndarray] = {}
    if include_mel_buffers:
        sd.update(_mel_buffers())
    sd.update(export_module_params(
        _host(state["params_ae"]), _host(state.get("batch_stats_ae") or {}),
        "ae.", reverse_autoencoder))
    for k in ("clip_code_mu", "clip_code_logvar"):
        if state.get(k) is not None:
            sd[k] = np.asarray(_host(state[k]))
    return sd


def save_torch_checkpoint(out_path: str, state_dict: Dict[str, np.ndarray],
                          epoch: int = 0, step: int = 0,
                          data_parallel_prefix: bool = True) -> None:
    """Write the reference's checkpoint layout: ``{epoch, step,
    model_state_dict}`` with torch tensors (reference trainer.py:305-321).

    ``data_parallel_prefix`` prepends ``module.`` to every key: the reference
    always wraps its model in DataParallel/DDP *before* ``load_state_dict``
    (reference voice2pose.py:221-231), so its checkpoints carry (and its
    STRICT_LOADING path requires) the prefix; it even indexes
    ``state_dict['module.clips_code']`` directly (voice2pose.py:62).  Our
    importer strips the prefix (torch_import.py), so round trips are
    unaffected.  Pass False only when feeding bare unwrapped modules."""
    import torch

    prefix = "module." if data_parallel_prefix else ""
    torch.save({"epoch": int(epoch), "step": int(step),
                "model_state_dict": {
                    prefix + k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in state_dict.items()}},
               out_path)


def export_checkpoint(cfg, checkpoint: str, out_path: str) -> Dict[str, Any]:
    """Load one of our orbax checkpoints and write a reference ``.pth``.

    Returns ``{epoch, step, num_keys}``."""
    from ..pipelines.trainer import Trainer

    if Trainer._is_torch_pth(checkpoint):
        raise ValueError(
            f"{checkpoint!r} is already a PyTorch checkpoint; --export_torch "
            "converts our orbax checkpoints to that format")
    tree = Trainer.load_checkpoint_tree(checkpoint)
    state = tree["state"]
    if cfg.PIPELINE_TYPE == "Voice2Pose":
        sd = export_voice2pose(state)
    elif cfg.PIPELINE_TYPE == "Pose2Pose":
        sd = export_pose2pose(state)
    else:
        raise ValueError(f"unknown pipeline {cfg.PIPELINE_TYPE!r}")
    save_torch_checkpoint(out_path, sd, epoch=int(tree.get("epoch", 0)),
                          step=int(tree.get("step", 0)))
    return {"epoch": int(tree.get("epoch", 0)), "step": int(tree.get("step", 0)),
            "num_keys": len(sd)}
