"""Import reference PyTorch checkpoints (.pth) into our Flax parameter trees.

Used for numerical-parity validation against the reference implementation
(SURVEY.md §4/§7) and for users migrating trained reference checkpoints.

Mechanics:
  - reference keys carry DataParallel's ``module.`` prefix — stripped
    (reference voice2pose.py:51,239 does the same);
  - conv weights transpose OIW -> WIO (1d) / OIHW -> HWIO (2d) for channels-last;
  - BatchNorm {weight, bias} -> params {scale, bias}; {running_mean, running_var}
    -> batch_stats {mean, var};
  - pairing is NAME-BASED via explicit per-architecture translators (order-based
    pairing is unsafe: jax.tree operations canonicalize dict keys to sorted order,
    which scrambles any insertion-order assumption).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

Path = Tuple[str, ...]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load ``model_state_dict`` from a reference .pth as numpy, module. stripped."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    return {k.replace("module.", ""): v.detach().numpy() for k, v in sd.items()}


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    if w.ndim == 3:  # (O, I, W) -> (W, I, O)
        return np.transpose(w, (2, 1, 0))
    if w.ndim == 4:  # (O, I, H, W) -> (H, W, I, O)
        return np.transpose(w, (2, 3, 1, 0))
    raise ValueError(f"unexpected conv weight ndim {w.ndim}")


# ---------------------------------------------------------------------------
# torch-module-path -> flax-param-path translators, one per architecture.
# Each takes the torch key split at the conv/norm parent (e.g.
# 'unet.e0') and returns our parent path (e.g. ('unet', 'e0')), or None if the
# entry belongs elsewhere.
# ---------------------------------------------------------------------------

def translate_generator(parent: str) -> Optional[Path]:
    """SequenceGeneratorCNN (reference generator.py:87-117 -> models/generator.py)."""
    parts = parent.split(".")
    if parts[0] == "audio_encoder" and parts[1] == "specgram_encoder_2d":
        blk, sub = int(parts[2]), int(parts[3])
        return ("audio_encoder", f"ConvNormRelu_{2 * blk + sub}")
    if parts[0] == "unet":
        return ("unet", parts[1])  # e0..e6, d5..d1 share names
    if parts[0] == "decoder":
        idx = int(parts[1])
        return (f"decoder_{idx}",) if idx < 4 else ("decoder_out",)
    return None


def translate_discriminator(parent: str) -> Optional[Path]:
    """PoseSequenceDiscriminator (reference discriminator.py:6-23)."""
    parts = parent.split(".")
    if parts[0] == "seq":
        idx = int(parts[1])
        return (f"ConvNormRelu_{idx}",) if idx < 3 else ("Conv_0",)
    return None


def translate_pose_encoder(parent: str) -> Optional[Path]:
    """Standalone PoseSeqEncoder (reference autoencoder.py:8-35)."""
    parts = parent.split(".")
    if parts[0] == "blocks":
        return (f"ConvNormRelu_{int(parts[1])}",)
    return None


def translate_autoencoder(parent: str) -> Optional[Path]:
    """Autoencoder (reference autoencoder.py:71-93)."""
    parts = parent.split(".")
    if parts[0] == "encoder":
        sub = translate_pose_encoder(".".join(parts[1:]))
        return ("encoder",) + sub if sub else None
    if parts[0] == "decoder":
        if parts[1] in ("d5", "d4", "d3", "d2", "d1"):
            return ("decoder", parts[1])
        if parts[1] == "blocks":
            idx = int(parts[2])
            return ("decoder", f"block_{idx}") if idx < 4 else ("decoder", "out")
    return None


def _get_node(tree: Dict[str, Any], path: Path, create: bool = False):
    node = tree
    for p in path:
        if create:
            node = node.setdefault(p, {})
        else:
            node = node[p]
    return node


def import_module_params(sd: Dict[str, np.ndarray], torch_prefix: str,
                         params: Dict[str, Any],
                         batch_stats: Optional[Dict[str, Any]],
                         translate: Callable[[str], Optional[Path]]):
    """Fill ``params``/``batch_stats`` (plain mutable dicts) from the torch state
    dict entries under ``torch_prefix``, using the architecture translator.

    Uses ``jnp.array`` (guaranteed copy), NOT ``jnp.asarray``: state-dict
    values are often zero-copy numpy VIEWS of live torch tensors
    (``t.detach().numpy()``), and CPU jax aliases host numpy buffers — an
    in-place torch optimizer/BN update would silently mutate the "imported"
    jax parameters."""
    import jax.numpy as jnp

    filled = 0
    unmatched = []
    for key, value in sd.items():
        if not key.startswith(torch_prefix):
            continue
        rel = key[len(torch_prefix):]
        if not rel.endswith(("weight", "bias", "running_mean", "running_var")):
            continue
        parent_key, leaf = rel.rsplit(".", 1)

        if parent_key.endswith(".conv"):
            path = translate(parent_key[: -len(".conv")])
            if path is None:
                unmatched.append(key)
                continue
            node = _get_node(params, path + ("conv",))
            assert leaf == "weight"
            node["kernel"] = jnp.array(_conv_to_flax(value))
            filled += 1
        elif parent_key.endswith(".norm"):
            path = translate(parent_key[: -len(".norm")])
            if path is None:
                unmatched.append(key)
                continue
            if leaf in ("weight", "bias"):
                node = _get_node(params, path + ("norm",), create=True)
                node["scale" if leaf == "weight" else "bias"] = jnp.array(value)
            elif batch_stats is not None:
                node = _get_node(batch_stats, path + ("norm",), create=True)
                node["mean" if leaf == "running_mean" else "var"] = jnp.array(value)
            filled += 1
        elif (leaf == "weight" and np.ndim(value) >= 3) or leaf == "bias":
            # plain final convs (no .conv. wrapper): decoder.4 / seq.3 / blocks.4
            path = translate(parent_key)
            if path is None:
                unmatched.append(key)
                continue
            node = _get_node(params, path)
            if leaf == "weight":
                node["kernel"] = jnp.array(_conv_to_flax(value))
            else:
                node["bias"] = jnp.array(value)
            filled += 1
    assert filled > 0, f"no entries imported for prefix {torch_prefix!r}"
    if unmatched:
        # a silently skipped tensor would leave RANDOM-INIT weights in the
        # imported model (e.g. a half-filled frozen FGD encoder computing
        # meaningless metrics) — refuse instead
        raise ValueError(
            f"{len(unmatched)} checkpoint tensors under {torch_prefix!r} have "
            f"no translation onto this architecture: {unmatched[:6]}; the "
            "checkpoint's layer layout does not match the configured model")
    return filled


def _to_mutable(tree) -> Dict[str, Any]:
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def import_voice2pose(pth_path: str, state: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference Voice2Pose checkpoint onto our pipeline state dict
    (params_g / params_d / params_pe / clips_code / batch_stats_*)."""
    import jax.numpy as jnp

    sd = load_torch_state_dict(pth_path)
    out = dict(state)

    params_g = _to_mutable(state["params_g"])
    bs_g = _to_mutable(state.get("batch_stats_g", {}))
    import_module_params(sd, "netG.", params_g, bs_g, translate_generator)
    out["params_g"], out["batch_stats_g"] = params_g, bs_g

    if "clips_code" in state and "clips_code" in sd:
        out["clips_code"] = jnp.array(sd["clips_code"])

    if "params_d" in state and any(k.startswith("netD_pose.") for k in sd):
        params_d = _to_mutable(state["params_d"])
        bs_d = _to_mutable(state.get("batch_stats_d", {}))
        import_module_params(sd, "netD_pose.", params_d, bs_d,
                             translate_discriminator)
        out["params_d"], out["batch_stats_d"] = params_d, bs_d

    if "params_pe" in state and any(k.startswith("pose_encoder.") for k in sd):
        params_pe = _to_mutable(state["params_pe"])
        bs_pe = _to_mutable(state.get("batch_stats_pe", {}))
        import_module_params(sd, "pose_encoder.", params_pe, bs_pe,
                             translate_pose_encoder)
        out["params_pe"], out["batch_stats_pe"] = params_pe, bs_pe
    return out


def import_pose2pose(pth_path: str, state: Dict[str, Any]) -> Dict[str, Any]:
    import jax.numpy as jnp

    sd = load_torch_state_dict(pth_path)
    out = dict(state)
    params = _to_mutable(state["params_ae"])
    bs = _to_mutable(state.get("batch_stats_ae", {}))
    import_module_params(sd, "ae.", params, bs, translate_autoencoder)
    out["params_ae"], out["batch_stats_ae"] = params, bs
    for k in ("clip_code_mu", "clip_code_logvar"):
        if k in sd:
            out[k] = jnp.array(sd[k])
    return out
