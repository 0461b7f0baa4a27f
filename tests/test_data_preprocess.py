"""Unit tests for the offline data-prep toolchain (pure-numpy parts)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data_preprocess"))

import generate_dataset_utils as gdu  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_pose137_to_pose121_indices(rng):
    x = rng.randn(3, 137).astype(np.float32)
    out = gdu.pose137_to_pose121(x)
    assert out.shape == (3, 121)
    ref_idx = [0] + list(range(2, 8)) + [15, 16] + list(range(25, 137))
    np.testing.assert_array_equal(out, x[:, ref_idx])


def test_deduct_root_parted_matches_runtime_chain(rng):
    """pose-137 parted rooting (4_1) must agree with the runtime 137->121 chain
    (remove_unused -> relative -> global_to_parted) on the shared keypoints."""
    from speechdrivestemplates_tpu.ops import pose as P

    pose = rng.randn(4, 3, 137).astype(np.float64) * 100
    centered, _ = gdu.deduct_root_parted(pose.copy())

    runtime = P.global_to_parted(P.absolute_to_relative(P.remove_unused_kp(pose)))
    # map keypoint-121 index -> keypoint-137 index
    idx_137 = np.array([0] + list(range(2, 8)) + [15, 16] + list(range(25, 137)))
    np.testing.assert_allclose(centered[:, :2, idx_137], runtime[:, :2, :],
                               atol=1e-9)


def test_frame_idx_to_time():
    assert gdu.frame_idx_to_time(0) == "00:00:00.000000"
    assert gdu.frame_idx_to_time(15) == "00:00:01.000000"
    assert gdu.frame_idx_to_time(15 * 3600 + 15 * 61) == "01:01:01.000000"


def _make_clips(tmp_path, n_clips=6):
    npz_dir = tmp_path / "npz"
    npz_dir.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n_clips):
        pose = rng.randn(64, 3, 137) * 50 + 400
        p = str(npz_dir / f"c{i}.npz")
        np.savez(p, pose=pose.astype(np.float32))
        rows.append({"dataset": "train", "pose_fn": p})
    return pd.DataFrame(rows)


def test_calculate_mean_std_accumulate(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "data_preprocess"))
    mod = __import__("4_1_calculate_mean_std")
    df = _make_clips(tmp_path)
    s, ss, c = mod.accumulate(df["pose_fn"], "parted")
    assert s.shape == (64, 2, 137) and c.shape == (64, 1, 137)
    mean = s / np.maximum(c, 1)
    std = np.sqrt(np.maximum(ss / np.maximum(c, 1) - mean ** 2, 0))
    assert np.isfinite(mean).all() and np.isfinite(std).all()
    # the root keypoint is exactly 0 after centering but counts as detected
    # (its absolute position is far from the origin), matching the reference mask
    assert c[:, 0, 1].min() > 0
    np.testing.assert_allclose(mean[:, :, 1], 0, atol=1e-12)


def test_remove_outlier_rule(tmp_path, rng):
    mod = __import__("2_2_remove_outlier", fromlist=["is_pose_outlier"])
    good = rng.rand(3, 137).astype(np.float32) * 500 + 10
    p_good = str(tmp_path / "good.npy")
    np.save(p_good, good)
    assert mod.is_pose_outlier(p_good) is False

    bad = good.copy()
    bad[:2, 50] = 1.0  # both coords of one kept keypoint near the origin
    p_bad = str(tmp_path / "bad.npy")
    np.save(p_bad, bad)
    assert mod.is_pose_outlier(p_bad) is True

    # a dropped (lower-body) keypoint near origin must NOT trigger the rule
    ok = good.copy()
    ok[:2, 10] = 1.0  # index 10 is removed by the 137->121 selection
    p_ok = str(tmp_path / "ok.npy")
    np.save(p_ok, ok)
    assert mod.is_pose_outlier(p_ok) is False


def test_shoulder_distance():
    mod = __import__("2_3_rescale_shoulder_width", fromlist=["shoulder_distance"])
    pose = np.zeros((3, 137), np.float32)
    pose[0, 5], pose[0, 2] = 100.0, 40.0  # shoulders 60 px apart on x
    assert abs(mod.shoulder_distance(pose) - 60.0) < 1e-6


def test_split_train_val_test_cli(tmp_path):
    base = tmp_path / "root"
    spk = base / "spk" / "tmp" / "intermediate_csv"
    spk.mkdir(parents=True)
    df = pd.DataFrame({"dataset": ["train"] * 100,
                       "pose_fn": [f"f{i}.npz" for i in range(100)]})
    df.to_csv(spk / "tmp_video1.csv", index=False)

    script = os.path.join(REPO, "data_preprocess", "3_2_split_train_val_test.py")
    subprocess.run([sys.executable, script, "-b", str(base), "-s", "spk"],
                   check=True, cwd=os.path.join(REPO, "data_preprocess"))
    out = pd.read_csv(base / "spk" / "processed_137.csv")
    counts = out["dataset"].value_counts()
    assert counts["train"] == 80
    assert counts["idle"] == 13
    assert counts["dev"] == 7  # runtime split name (the csv the dataset reads)


def test_dataset_audit_and_two_camera_utils(tmp_path):
    """Ports of the reference's dataset-audit and two-camera one-offs
    (generate_dataset_utils.py:179-528), path-parameterized."""
    import pandas as pd

    import generate_dataset_utils as gdu

    # chunker
    chunks = gdu.chunk_for_workers(list(range(10)), 3)
    assert [len(c) for c in chunks] == [4, 4, 2]
    assert sum(chunks, []) == list(range(10))

    # split counts
    df = pd.DataFrame({"dataset": ["train"] * 3 + ["dev"] * 2 + ["idle"],
                       "pose_fn": ["x"] * 6})
    p = str(tmp_path / "processed.csv")
    df.to_csv(p, index=False)
    assert gdu.dataset_split_counts(p) == {"train": 3, "dev": 2, "idle": 1,
                                           "total": 6}

    # out-of-frame quarantine
    kp_dir = tmp_path / "kp"
    kp_dir.mkdir()
    good = np.zeros((3, 137)) + 400
    bad = good.copy()
    bad[0, 3] = 5.0  # x_min < 15 on a body keypoint
    np.save(str(kp_dir / "f0.npy"), good)
    np.save(str(kp_dir / "f1.npy"), bad)
    moved = gdu.quarantine_out_of_frame_kp(str(kp_dir), str(tmp_path / "trash"))
    assert moved == 1
    assert sorted(os.listdir(kp_dir)) == ["f0.npy"]
    assert sorted(os.listdir(tmp_path / "trash")) == ["f1.npy"]

    # two-camera split + shoulder averages + unification
    cam_dir = tmp_path / "cams"
    cam_dir.mkdir()
    fns = []
    for i, (rootx, sh) in enumerate([(300, 100.0), (900, 200.0)]):
        pose = np.zeros((3, 137)) + rootx
        pose[0, 1] = rootx
        pose[0, 2] = rootx - sh / 2
        pose[0, 5] = rootx + sh / 2
        pose[1, 2] = pose[1, 5] = 360.0
        pose[2, 2], pose[2, 5] = 0.3, 0.9  # differing confidences must not
        # leak into the shoulder distance (x,y only)
        fn = str(cam_dir / f"p{i}.npy")
        np.save(fn, pose)
        fns.append(fn)
    df = gdu.split_left_right(fns, frame_w=1280, rename=True)
    assert sorted(df["camera"]) == ["left", "right"]
    assert all(fn.endswith(("_l.npy", "_r.npy")) for fn in df["pose_fn"])
    avgs = gdu.camera_shoulder_averages(df)
    assert abs(avgs["left"] - 100.0) < 1e-6 and abs(avgs["right"] - 200.0) < 1e-6
    n = gdu.unify_left_right(df, left_scalar=1.0, right_scalar=2.0)
    assert n == 1
    avgs2 = gdu.camera_shoulder_averages(df)
    assert abs(avgs2["right"] - 400.0) < 1e-6  # x2 rescale applied in place
