"""Pose-transform parity: our gather+FMA formulation vs a direct NumPy port of the
reference's in-place indexed mutations (gesture_dataset.py:131-236)."""

import numpy as np
import pytest

from speechdrivestemplates_tpu.ops import pose as P


# -- reference logic, transcribed as plain numpy for oracle checking ------------

def ref_remove_unused_kp(poses):
    indices = list(range(0, 8)) + [15, 16] + list(range(25, 137))
    return poses[..., :, indices]


def ref_absolute_to_relative(poses):
    poses = poses.copy()
    poses[..., :2, :] = poses[..., :2, :] - poses[..., :2, 1, None]
    indices = [0] + list(range(2, 122))
    return poses[..., :, indices]


def ref_parted_to_global(poses):
    poses = poses.copy()
    head_root, hl, hr = 39, 6, 3
    indices = list(range(9, head_root)) + list(range(head_root + 1, 79))
    poses[..., :2, indices] = poses[..., :2, indices] + poses[..., :2, head_root, None]
    poses[..., :2, 79:100] = poses[..., :2, 79:100] + poses[..., :2, hl, None]
    poses[..., :2, 100:121] = poses[..., :2, 100:121] + poses[..., :2, hr, None]
    return poses


def ref_global_to_parted(poses):
    poses = poses.copy()
    head_root, hl, hr = 39, 6, 3
    indices = list(range(9, head_root)) + list(range(head_root + 1, 79))
    poses[..., :2, indices] = poses[..., :2, indices] - poses[..., :2, head_root, None]
    poses[..., :2, 79:100] = poses[..., :2, 79:100] - poses[..., :2, hl, None]
    poses[..., :2, 100:121] = poses[..., :2, 100:121] - poses[..., :2, hr, None]
    return poses


@pytest.fixture
def poses137(rng):
    return rng.randn(4, 3, 137).astype(np.float32)  # (T, C=3, K)


def test_remove_unused_kp(poses137):
    np.testing.assert_array_equal(P.remove_unused_kp(poses137),
                                  ref_remove_unused_kp(poses137))


def test_absolute_to_relative(poses137):
    p122 = ref_remove_unused_kp(poses137)
    np.testing.assert_allclose(P.absolute_to_relative(p122),
                               ref_absolute_to_relative(p122), rtol=1e-6)


def test_parted_global_roundtrip_and_parity(rng):
    p = rng.randn(2, 8, 2, 121).astype(np.float32)  # (B, T, 2, K)
    np.testing.assert_allclose(P.parted_to_global(p), ref_parted_to_global(p), rtol=1e-5)
    np.testing.assert_allclose(P.global_to_parted(p), ref_global_to_parted(p), rtol=1e-5)
    round_trip = P.global_to_parted(P.parted_to_global(p))
    np.testing.assert_allclose(round_trip, p, atol=1e-5)


def test_parted_global_with_score_channel(rng):
    p = rng.randn(8, 3, 121).astype(np.float32)
    ours = P.parted_to_global(p)
    theirs = ref_parted_to_global(p)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)
    np.testing.assert_array_equal(ours[..., 2, :], p[..., 2, :])  # score passthrough


def test_normalize_roundtrip(rng):
    kp = rng.randn(8, 2, 121).astype(np.float32)
    mean = rng.randn(242).astype(np.float32)
    std = (rng.rand(242).astype(np.float32) + 0.5)
    n = P.normalize_poses(kp, mean, std)
    d = P.denormalize_poses(n, mean, std)
    np.testing.assert_allclose(d, kp, atol=1e-4)
    # reference reshape semantics: (242,) -> (1, 2, 121)
    expected = (kp - mean.reshape(1, 2, 121)) / std.reshape(1, 2, 121)
    np.testing.assert_allclose(n, expected, rtol=1e-6)


def test_normalize_batched_stats(rng):
    kp = rng.randn(3, 8, 2, 121).astype(np.float32)
    mean = rng.randn(3, 242).astype(np.float32)
    std = rng.rand(3, 242).astype(np.float32) + 0.5
    n = P.normalize_poses(kp, mean, std)
    expected = (kp - mean.reshape(3, 1, 2, 121)) / std.reshape(3, 1, 2, 121)
    np.testing.assert_allclose(n, expected, rtol=1e-6)


def test_get_final_results(rng):
    kp = rng.randn(3, 8, 2, 121).astype(np.float32)
    mean = rng.randn(3, 242).astype(np.float32)
    std = rng.rand(3, 242).astype(np.float32) + 0.5
    sf = rng.rand(3).astype(np.float32) + 1.0
    out = P.get_final_results(kp, mean, std, sf, hierarchical=True)
    ref = ref_parted_to_global(kp * std.reshape(3, 1, 2, 121) + mean.reshape(3, 1, 2, 121))
    ref = ref * sf.reshape(3, 1, 1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_transform_normalized_parted2global(rng):
    kp = rng.randn(2, 8, 2, 121).astype(np.float32)
    pm, ps = rng.randn(242).astype(np.float32), rng.rand(242).astype(np.float32) + 0.5
    gm, gs = rng.randn(242).astype(np.float32), rng.rand(242).astype(np.float32) + 0.5
    out = P.transform_normalized_parted2global(kp, pm, ps, gm, gs)
    ref = ref_parted_to_global(kp * ps.reshape(1, 2, 121) + pm.reshape(1, 2, 121))
    ref = (ref - gm.reshape(1, 2, 121)) / gs.reshape(1, 2, 121)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_jnp_matches_numpy(rng):
    import jax.numpy as jnp

    p = rng.randn(2, 8, 2, 121).astype(np.float32)
    np.testing.assert_allclose(np.asarray(P.parted_to_global(jnp.asarray(p))),
                               P.parted_to_global(p), rtol=1e-5)
