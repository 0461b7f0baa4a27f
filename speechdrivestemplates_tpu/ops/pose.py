"""Keypoint-space transforms, TPU-first.

The reference implements these as in-place indexed mutations on torch tensors
(``core/datasets/gesture_dataset.py:131-236``).  Here they are pure functions over the
last two axes ``(..., C, K)`` (C = 2 coords [+1 score], K = keypoints), expressed as
static gathers + fused multiply-adds so XLA lowers them to a handful of vector ops —
no scatter, no data-dependent control flow.  All functions accept numpy or jax.numpy
arrays (the loader uses numpy; the jitted train step uses jnp on device).

Keypoint layout (121 kps, reference pose_definition.md):
  0..8    upper body (root/neck kp already removed)
  9..78   face (70)
  79..99  left hand (21), 100..120 right hand (21)
Hierarchical ("parted") space re-roots the face at HEAD_ROOT and each hand at its wrist
anchor (reference gesture_dataset.py:40-43,147-165).
"""

from __future__ import annotations

import numpy as np

# Anchor indices in keypoint-121 space (reference gesture_dataset.py:40-43).
HAND_ROOT_L = 6
HAND_ROOT_R = 3
HEAD_ROOT = 39
ROOT_NODE_122 = 1  # index of the root in keypoint-122 space


def _build_reroot_tables(num_kp: int = 121):
    """For each keypoint: the index of its part root, and 1.0 if it is re-rooted.

    parted = global - coords[ROOT_INDEX] * MASK;  global = parted + same.
    Mirrors reference gesture_dataset.py:147-165: face kps (9..78 except HEAD_ROOT)
    root at HEAD_ROOT; kps 79:100 at HAND_ROOT_L; 100:121 at HAND_ROOT_R.
    """
    root_index = np.arange(num_kp, dtype=np.int32)
    mask = np.zeros(num_kp, dtype=np.float32)
    head_members = list(range(9, HEAD_ROOT)) + list(range(HEAD_ROOT + 1, 79))
    root_index[head_members] = HEAD_ROOT
    mask[head_members] = 1.0
    root_index[79:100] = HAND_ROOT_L
    mask[79:100] = 1.0
    root_index[100:121] = HAND_ROOT_R
    mask[100:121] = 1.0
    return root_index, mask


_REROOT_INDEX, _REROOT_MASK = _build_reroot_tables()

# 137 -> 122 keypoint selection: drop the lower body (reference gesture_dataset.py:131-136).
KP_137_TO_122 = np.array(
    list(range(0, 8)) + [15, 16] + list(range(25, 137)), dtype=np.int32
)
# 122 -> 121: drop the root node (reference gesture_dataset.py:138-145).
KP_122_TO_121 = np.array([0] + list(range(2, 122)), dtype=np.int32)


def remove_unused_kp(poses):
    """(..., C, 137) -> (..., C, 122): drop lower-body keypoints."""
    assert poses.shape[-1] == 137, f"expected 137 kps, got {poses.shape[-1]}"
    return poses[..., :, KP_137_TO_122]


def absolute_to_relative(poses):
    """(..., C, 122) -> (..., C, 121): center x,y at the root node, then drop it.

    Only the first two channel rows (x, y) are root-centered; a score row, if present,
    passes through (reference gesture_dataset.py:138-145).
    """
    xy = poses[..., :2, :] - poses[..., :2, ROOT_NODE_122, None]
    if poses.shape[-2] > 2:
        rest = poses[..., 2:, :]
        poses = _concat(xy, rest, axis=-2)
    else:
        poses = xy
    return poses[..., :, KP_122_TO_121]


def _concat(a, b, axis):
    if isinstance(a, np.ndarray):
        return np.concatenate([a, b], axis=axis)
    import jax.numpy as jnp

    return jnp.concatenate([a, b], axis=axis)


def _reroot(poses, sign: float):
    """Shared body of parted_to_global (+1) / global_to_parted (-1) as gather + FMA."""
    xy = poses[..., :2, :]
    roots = xy[..., :, _REROOT_INDEX]  # static gather
    mask = _REROOT_MASK
    if not isinstance(poses, np.ndarray):
        import jax.numpy as jnp

        mask = jnp.asarray(mask)
    xy = xy + sign * roots * mask
    if poses.shape[-2] > 2:
        return _concat(xy, poses[..., 2:, :], axis=-2)
    return xy


def parted_to_global(poses):
    """Hierarchical -> global relative poses (reference gesture_dataset.py:147-156)."""
    return _reroot(poses, +1.0)


def global_to_parted(poses):
    """Global -> hierarchical relative poses (reference gesture_dataset.py:157-165)."""
    return _reroot(poses, -1.0)


def _broadcast_stat(stat, kp_ndim: int, num_landmarks: int):
    """Reshape a flat (242,) or batched (B, 242) mean/std to broadcast over (..., T, 2, K).

    Mirrors reference gesture_dataset.py:173-191: per-speaker stats reshape to
    (1, 2, K) against (T, 2, K) samples; batched stats to (B, 1, 2, K) against
    (B, T, 2, K) batches.
    """
    if stat.ndim == 1:
        return stat.reshape(1, 2, num_landmarks)
    elif stat.ndim == 2:
        return stat.reshape(stat.shape[0], 1, 2, num_landmarks)
    raise NotImplementedError(f"stat ndim {stat.ndim} unsupported")


def normalize_poses(kp, mean, std, num_landmarks: int = 121):
    """Per-speaker z-score (reference gesture_dataset.py:173-191)."""
    mean = _broadcast_stat(mean, kp.ndim, num_landmarks)
    std = _broadcast_stat(std, kp.ndim, num_landmarks)
    return (kp - mean) / std


def denormalize_poses(kp, mean, std, num_landmarks: int = 121):
    """Inverse z-score (reference gesture_dataset.py:193-211)."""
    mean = _broadcast_stat(mean, kp.ndim, num_landmarks)
    std = _broadcast_stat(std, kp.ndim, num_landmarks)
    return kp * std + mean


def get_final_results(poses, mean, std, scale_factor, hierarchical: bool,
                      num_landmarks: int = 121):
    """Denormalize -> (optionally) re-root to global -> scale to pixels.

    Matches reference gesture_dataset.py:213-220. ``poses``: (B, T, 2, K);
    ``mean``/``std``: (B, 242); ``scale_factor``: (B,).
    """
    poses = denormalize_poses(poses, mean, std, num_landmarks)
    if hierarchical:
        poses = parted_to_global(poses)
    return poses * scale_factor.reshape(-1, 1, 1, 1)


def transform_normalized_parted2global(poses, parted_mean, parted_std,
                                       global_mean, global_std,
                                       num_landmarks: int = 121):
    """Map a parted-normalized batch into the global-normalized space expected by the
    FGD pose encoder (reference gesture_dataset.py:222-236)."""
    poses = denormalize_poses(poses, parted_mean, parted_std, num_landmarks)
    poses = parted_to_global(poses)
    return normalize_poses(poses, global_mean, global_std, num_landmarks)
