"""Custom-speaker loop: 4_1 stats -> 4_2 sidecar npz -> dataset auto-registration,
with no source edits (the reference requires pasting arrays into speakers_stat.py)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _build_custom_speaker(tmp_path, name="newbie", n_clips=6):
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker

    root = tmp_path / "speakers"
    make_synthetic_speaker(str(root), name, num_train=n_clips, num_dev=2)
    spk = root / name
    # clips.csv with absolute pose paths (4_1 reads it)
    df = pd.read_csv(spk / "processed_137.csv")
    df["pose_fn"] = [str(spk / f) for f in df["pose_fn"]]
    df.to_csv(spk / "clips.csv", index=False)
    return str(root), str(spk)


def test_custom_speaker_stats_pipeline(tmp_path):
    root, spk = _build_custom_speaker(tmp_path)
    env = dict(os.environ, PYTHONPATH="")

    # 4_1: masked mean/std over the train split
    r = subprocess.run([sys.executable, "4_1_calculate_mean_std.py",
                        "-b", root, "-s", "newbie", "-m", "parted"],
                       cwd=os.path.join(REPO, "data_preprocess"), env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-1500:]
    assert os.path.exists(os.path.join(spk, "mean_std-parted.npz"))

    # 4_2: 137 -> 121 + runtime sidecar
    r = subprocess.run([sys.executable, "4_2_parse_mean_std_npz.py",
                        os.path.join(spk, "mean_std-parted.npz"),
                        "--speaker", "newbie", "--scale_factor", "1.0",
                        "--mode", "parted"],
                       cwd=os.path.join(REPO, "data_preprocess"), env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1500:]
    sidecar = os.path.join(spk, "speaker_stat-parted.npz")
    assert os.path.exists(sidecar)

    # dataset auto-registers the sidecar for the unknown speaker
    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets import get_dataset

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(REPO, "configs", "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "newbie"
    ds = get_dataset("GestureDataset")(root, "newbie", "train", cfg)
    item = ds[0]
    assert item["poses"].shape == (64, 2, 121)
    assert np.isfinite(item["poses"]).all()
    assert item["speaker_stat"]["mean"].shape == (242,)
