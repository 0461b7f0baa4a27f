"""CLI surface of the offline keypoint inspectors (utils/viz.py __main__)."""

import os

import numpy as np




def test_viz_cli_inspectors(tmp_path):
    """python -m ...utils.viz {npz,csv} — the offline-inspector CLI surface
    (reference keypoint_visualization.py __main__, headless)."""
    import csv
    import subprocess
    import sys

    spk = tmp_path / "alice"
    clips = spk / "clips" / "vid0"
    clips.mkdir(parents=True)
    pose = np.random.rand(8, 3, 137).astype(np.float32) * 300
    np.savez(clips / "c0.npz", pose=pose,
             imgs=np.array(["missing.jpg"] * 8),
             audio=np.zeros(100, np.float32))
    with open(spk / "processed_137.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["pose_fn", "dataset"])
        w.writeheader()
        w.writerow({"pose_fn": "clips/vid0/c0.npz", "dataset": "train"})

    out1 = tmp_path / "o1"
    out1.mkdir()
    r = subprocess.run(
        [sys.executable, "-m", "speechdrivestemplates_tpu.utils.viz", "npz",
         str(clips / "c0.npz"), "-o", str(out1), "--max-frames", "3"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr
    assert len(list(out1.glob("frame_*.jpg"))) == 3

    r = subprocess.run(
        [sys.executable, "-m", "speechdrivestemplates_tpu.utils.viz", "csv",
         str(tmp_path), "alice", "--max-clips", "1", "--max-frames", "2"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr
    assert "1 clips" in r.stdout
