"""Import reference PyTorch checkpoints (.pth) into our Flax parameter trees.

Used for numerical-parity validation against the reference implementation
(SURVEY.md §4/§7: "PyTorch checkpoint interop for parity testing") and for users
migrating trained reference checkpoints.

Mechanics:
  - reference keys carry DataParallel's ``module.`` prefix — stripped
    (reference voice2pose.py:51,239 does the same);
  - conv weights transpose OIW -> WIO (1d) / OIHW -> HWIO (2d) for channels-last;
  - BatchNorm {weight, bias} -> params {scale, bias}; {running_mean, running_var}
    -> batch_stats {mean, var};
  - pairing is ORDER-BASED: torch state-dict key order is module registration order,
    which matches our modules' call/creation order by construction (both follow the
    reference architecture layer-for-layer).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load ``model_state_dict`` from a reference .pth as numpy, module. stripped."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    return {k.replace("module.", ""): v.detach().numpy() for k, v in sd.items()}


def _ordered_convs(sd: Dict[str, np.ndarray], prefix: str) -> List[Tuple[str, np.ndarray]]:
    """Conv weight entries (ndim >= 3) under ``prefix`` in state-dict order."""
    out = []
    for k, v in sd.items():
        if k.startswith(prefix) and k.endswith("weight") and np.ndim(v) >= 3:
            out.append((k, v))
    return out


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    if w.ndim == 3:  # (O, I, W) -> (W, I, O)
        return np.transpose(w, (2, 1, 0))
    if w.ndim == 4:  # (O, I, H, W) -> (H, W, I, O)
        return np.transpose(w, (2, 3, 1, 0))
    raise ValueError(f"unexpected conv weight ndim {w.ndim}")


def _walk_conv_dicts(tree: Dict[str, Any], path=()):
    """Yield (path, subdict) for every subdict holding a conv 'kernel', in
    insertion order (== call order for our modules)."""
    if "kernel" in tree and not isinstance(tree["kernel"], dict):
        yield path, tree
        return
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk_conv_dicts(v, path + (k,))


def _set_in(tree: Dict[str, Any], path: Tuple[str, ...], key: str, value):
    node = tree
    for p in path:
        node = node[p]
    node[key] = value


def import_module_params(sd: Dict[str, np.ndarray], torch_prefix: str,
                         params: Dict[str, Any],
                         batch_stats: Dict[str, Any] | None):
    """Fill ``params``/``batch_stats`` (plain mutable dicts) from the torch
    state dict entries under ``torch_prefix``, pairing convs in order."""
    import jax.numpy as jnp

    convs = _ordered_convs(sd, torch_prefix)
    ours = list(_walk_conv_dicts(params))
    assert len(convs) == len(ours), (
        f"conv count mismatch under {torch_prefix!r}: torch {len(convs)} vs "
        f"flax {len(ours)} ({[k for k, _ in convs]} vs {[p for p, _ in ours]})")

    for (tkey, tw), (path, node) in zip(convs, ours):
        node["kernel"] = jnp.asarray(_conv_to_flax(tw))
        base = tkey[: -len("weight")]
        if base + "bias" in sd:
            node["bias"] = jnp.asarray(sd[base + "bias"])
        # sibling norm (ConvNormRelu BN): '<parent>.conv.weight' -> '<parent>.norm.*'
        if base.endswith("conv."):
            nbase = base[: -len("conv.")] + "norm."
            if nbase + "weight" in sd:  # BN (IN has no params upstream)
                parent = params
                for p in path[:-1]:
                    parent = parent[p]
                parent["norm"] = {"scale": jnp.asarray(sd[nbase + "weight"]),
                                  "bias": jnp.asarray(sd[nbase + "bias"])}
                if batch_stats is not None and nbase + "running_mean" in sd:
                    bs_parent = batch_stats
                    for p in path[:-1]:
                        bs_parent = bs_parent.setdefault(p, {})
                    bs_parent["norm"] = {
                        "mean": jnp.asarray(sd[nbase + "running_mean"]),
                        "var": jnp.asarray(sd[nbase + "running_var"])}


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
    import_module_params(sd, "netG.", params_g, bs_g)
    out["params_g"], out["batch_stats_g"] = params_g, bs_g

    if "clips_code" in state and "clips_code" in sd:
        out["clips_code"] = jnp.asarray(sd["clips_code"])

    if "params_d" in state:
        params_d = _to_mutable(state["params_d"])
        bs_d = _to_mutable(state.get("batch_stats_d", {}))
        import_module_params(sd, "netD_pose.", params_d, bs_d)
        out["params_d"], out["batch_stats_d"] = params_d, bs_d

    if "params_pe" in state and any(k.startswith("pose_encoder.") for k in sd):
        params_pe = _to_mutable(state["params_pe"])
        bs_pe = _to_mutable(state.get("batch_stats_pe", {}))
        import_module_params(sd, "pose_encoder.", params_pe, bs_pe)
        out["params_pe"], out["batch_stats_pe"] = params_pe, bs_pe
    return out


def import_pose2pose(pth_path: str, state: Dict[str, Any]) -> Dict[str, Any]:
    import jax.numpy as jnp

    sd = load_torch_state_dict(pth_path)
    out = dict(state)
    params = _to_mutable(state["params_ae"])
    bs = _to_mutable(state.get("batch_stats_ae", {}))
    import_module_params(sd, "ae.", params, bs)
    out["params_ae"], out["batch_stats_ae"] = params, bs
    for k in ("clip_code_mu", "clip_code_logvar"):
        if k in sd:
            out[k] = jnp.asarray(sd[k])
    return out
