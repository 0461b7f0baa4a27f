"""Shared helpers for the offline data-prep toolchain.

Mirrors the ffmpeg wrappers of the reference's
``data_preprocess/generate_dataset_utils.py:13-56`` (fps normalization, frame
extraction, audio extraction) plus the pose-space helpers used by 2_x/4_x.  All
ffmpeg use is offline data prep; it shells out to the system binary and raises a
clear error when ffmpeg is absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

FPS = 15
SR = 16000
FRAMES_PER_SAMPLE = 64


def _ffmpeg() -> str:
    path = shutil.which("ffmpeg")
    if path is None:
        raise RuntimeError(
            "ffmpeg binary not found on PATH; the 1_x/3_1 data-prep steps need it")
    return path


def _run(cmd: list[str]) -> None:
    print("command:", " ".join(cmd))
    subprocess.run(cmd, check=True)


def dir_change_fps(video_dir: str, target_dir: str, fps: int = FPS) -> None:
    """Re-encode every video in ``video_dir`` at ``fps`` into ``target_dir``."""
    os.makedirs(target_dir, exist_ok=True)
    for video_nm in sorted(os.listdir(video_dir)):
        _run([_ffmpeg(), "-i", os.path.join(video_dir, video_nm),
              "-qscale", "0", "-r", str(fps), "-y",
              os.path.join(target_dir, video_nm)])


def dir_video2frames(video_dir: str, target_dir: str, fps: int = FPS) -> None:
    """Extract jpg frames at ``fps`` for every video, one subdir per video."""
    assert fps in (15, 25)
    os.makedirs(target_dir, exist_ok=True)
    for video_nm in sorted(os.listdir(video_dir)):
        stem = os.path.splitext(video_nm)[0]
        out_dir = os.path.join(target_dir, stem)
        os.makedirs(out_dir, exist_ok=True)
        _run([_ffmpeg(), "-i", os.path.join(video_dir, video_nm),
              "-qscale", "0", "-r", str(fps), "-y",
              os.path.join(out_dir, f"{stem}_%6d.jpg")])


def dir_change_resolution(video_dir: str, target_dir: str, height: int = 720) -> None:
    """Re-encode every video scaled to the given height (reference
    generate_dataset_utils.py:47-53)."""
    os.makedirs(target_dir, exist_ok=True)
    for video_nm in sorted(os.listdir(video_dir)):
        _run([_ffmpeg(), "-i", os.path.join(video_dir, video_nm),
              "-qscale", "0", "-strict", "-2", "-vf", f"scale=-1:{height}",
              "-y", os.path.join(target_dir, video_nm)])


def save_audio_sample_from_video(vid_path: str, audio_out_path: str,
                                 audio_start: str, audio_end: str,
                                 sr: int = 48000) -> None:
    os.makedirs(os.path.dirname(audio_out_path), exist_ok=True)
    _run([_ffmpeg(), "-i", vid_path, "-ss", str(audio_start), "-to", str(audio_end),
          "-ab", "160k", "-ac", "2", "-ar", str(sr), "-vn", audio_out_path,
          "-y", "-loglevel", "warning"])


def frame_idx_to_time(frame_idx: int, fps: int = FPS) -> str:
    all_seconds = frame_idx / float(fps)
    hour = int(all_seconds // 3600)
    minute = int((all_seconds % 3600) // 60)
    seconds = (all_seconds % 3600) % 60
    return f"{hour:02d}:{minute:02d}:{seconds:09.6f}"


def pose137_to_pose121(x: np.ndarray) -> np.ndarray:
    """(..., C, 137) -> (..., C, 121): upper body + eyes + face/hands."""
    return np.concatenate([x[..., :, 0:1], x[..., :, 2:8],
                           x[..., :, 15:17],
                           x[..., :, 25:]], axis=-1)


# pose-137 part anchors used by the mean/std scripts (reference 4_1:59-72)
P137_GLOBAL_ROOT = 1
P137_FACE_BEGIN, P137_FACE_ROOT = 25, 55
P137_HANDL_BEGIN, P137_HANDL_ROOT = 95, 7
P137_HANDR_BEGIN, P137_HANDR_ROOT = 116, 4


def deduct_root_global(poses: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Root-center a (..., 3, 137) pose batch; returns (centered, saved_roots)."""
    poses = poses.copy()
    root = poses[..., :2, P137_GLOBAL_ROOT].copy()
    poses[..., :2, :] -= poses[..., :2, P137_GLOBAL_ROOT, None]
    return poses, root


def deduct_root_parted(poses: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Root-center then re-root face at nose and hands at wrists (pose-137 space)."""
    poses, root = deduct_root_global(poses)
    fb, fr = P137_FACE_BEGIN, P137_FACE_ROOT
    face_idx = list(range(fb, fr)) + list(range(fr + 1, fb + 70))
    poses[..., :2, face_idx] -= poses[..., :2, fr, None]
    poses[..., :2, P137_HANDL_BEGIN:P137_HANDL_BEGIN + 21] -= (
        poses[..., :2, P137_HANDL_ROOT, None])
    poses[..., :2, P137_HANDR_BEGIN:P137_HANDR_BEGIN + 21] -= (
        poses[..., :2, P137_HANDR_ROOT, None])
    return poses, root


# --- new-speaker rescale-target derivation (reference generate_dataset_utils.py
# cal_speaker_scalar, :140-177) -------------------------------------------------

# The canonical speaker everything is rescaled against: oliver's mean shoulder
# width in pixels, and oliver's own DATASET.SCALE_FACTOR.
OLIVER_SHOULDER_DIST = 331.0850066245443
OLIVER_SCALAR = 0.9549234615419752


def mean_shoulder_distance(mean: "np.ndarray") -> float:
    """Shoulder width of a 4_1 mean table ((1, 2, 137) or (1, 3, 137):
    keypoints 2 and 5 are the pose-137 shoulders)."""
    mean = np.asarray(mean, dtype=np.float64)
    return float(np.sqrt(np.sum((mean[0, :2, 2] - mean[0, :2, 5]) ** 2)))


def cal_speaker_scalar(mean_std_path: str) -> float:
    """Derive a NEW speaker's visualization/metric scalar from its 4_1 stats
    file (mean_std-*.npz with a 'mean' entry, or a bare .npy mean): the scalar
    that puts the speaker's shoulder width on oliver's normalized scale.  This
    is how the hardcoded per-speaker scale factors in speakers_stat were
    produced upstream."""
    if mean_std_path.endswith(".npz"):
        with np.load(mean_std_path) as z:
            mean = np.asarray(z["mean"])
    elif mean_std_path.endswith(".npy"):
        mean = np.load(mean_std_path)
    else:
        raise ValueError(f"expected .npz or .npy stats file: {mean_std_path}")
    dist = mean_shoulder_distance(mean)
    return OLIVER_SHOULDER_DIST * OLIVER_SCALAR / dist


# --- dataset auditing + multi-camera (two-view) utilities -----------------------
# Reference: generate_dataset_utils.py:179-528 (check_dataset_single,
# dataset_statistics, distribute_for_multiprocess, Speech2gestureDatasetGenerator
# .check_kp, LigeDatasetGenerator.split_left_right / compare_shoulder /
# unify_left_right_direct).  The upstream versions hardcode the authors' cluster
# paths and interactive prompts; these take explicit paths and return values.

def chunk_for_workers(items: list, num_workers: int) -> list:
    """Split a list into ``num_workers`` contiguous chunks (last takes the rest)."""
    per = -(-len(items) // max(1, num_workers))
    return [items[i * per:(i + 1) * per] for i in range(num_workers - 1)] + [
        items[(num_workers - 1) * per:]]


def dataset_split_counts(csv_path: str) -> dict:
    """Per-split clip counts of a processed csv ({'train': n, 'dev': n, 'idle': n,
    'total': n}); the reference prints these per speaker."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    return {"train": int((df["dataset"] == "train").sum()),
            "dev": int((df["dataset"] == "dev").sum()),
            "idle": int((df["dataset"] == "idle").sum()),
            "total": int(len(df))}


def dataset_statistics(csv_paths: list) -> None:
    """Print split counts for a list of processed csvs (reference :202-223)."""
    for csv_path in csv_paths:
        try:
            c = dataset_split_counts(csv_path)
            name = os.path.basename(csv_path)
            print(f"dataset: {name:>40s}, train: {c['train']:>6d}, "
                  f"dev: {c['dev']:>6d}, idle: {c['idle']:>3d}, "
                  f"total: {c['total']:>6d}")
        except Exception as e:  # keep auditing the rest
            print(f"ERROR when checking {csv_path}: {e}")


def is_out_of_frame(kp: np.ndarray, frame_w: int = 1280,
                    margin_x: int = 15, margin_y: int = 5) -> bool:
    """Reference quarantine rule for per-frame keypoints (3, 137): subject
    touching the frame edges (x_min < margin, x_max > W - margin, y_min <
    margin) means a partial/failed detection."""
    body = pose137_to_pose121(kp[None])[0][:2]
    return bool(body[0].min() < margin_x or body[0].max() > frame_w - margin_x
                or body[1].min() < margin_y)


def quarantine_out_of_frame_kp(kp_dir: str, trash_dir: str,
                               frame_w: int = 1280) -> int:
    """Move per-frame .npy keypoints that fail ``is_out_of_frame`` into
    ``trash_dir``; returns how many were quarantined (reference check_kp)."""
    os.makedirs(trash_dir, exist_ok=True)
    moved = 0
    for fn in sorted(os.listdir(kp_dir)):
        if not fn.endswith(".npy"):
            continue
        path = os.path.join(kp_dir, fn)
        if is_out_of_frame(np.load(path), frame_w):
            shutil.move(path, os.path.join(trash_dir, fn))
            moved += 1
    return moved


def split_left_right(pose_fns: list, frame_w: int = 1280,
                     rename: bool = True) -> "pd.DataFrame":
    """Two-camera datasets: label each per-frame pose 'left'/'right' by the
    root keypoint's x (threshold W/2) and optionally rename files with _l/_r
    suffixes; returns a DataFrame[pose_fn, camera] (reference :324-370)."""
    import pandas as pd

    thd = frame_w // 2
    rows = []
    for pose_fn in pose_fns:
        pose = np.load(pose_fn)
        camera = "left" if float(pose[0, P137_GLOBAL_ROOT]) <= thd else "right"
        out_fn = pose_fn
        if rename:
            d, raw = os.path.split(pose_fn)
            stem, ext = os.path.splitext(raw)
            if not (stem.endswith("_l") or stem.endswith("_r")):
                out_fn = os.path.join(
                    d, stem + ("_l" if camera == "left" else "_r") + ext)
                os.rename(pose_fn, out_fn)
        rows.append({"pose_fn": out_fn, "camera": camera})
    return pd.DataFrame(rows)


def camera_shoulder_averages(df: "pd.DataFrame") -> dict:
    """Mean shoulder width per camera label (reference compare_shoulder)."""
    out = {}
    for cam, group in df.groupby("camera"):
        # x,y only — row 2 is the detector confidence, not a coordinate
        dists = [float(np.sqrt(np.sum((p[:2, 2] - p[:2, 5]) ** 2)))
                 for p in (np.load(fn) for fn in group["pose_fn"])]
        out[cam] = float(np.mean(dists)) if dists else float("nan")
    return out


def unify_left_right(df: "pd.DataFrame", left_scalar: float,
                     right_scalar: float) -> int:
    """Rescale every right-camera pose in place by right_scalar/left_scalar so
    both views share the left camera's scale (reference
    unify_left_right_direct); returns the number of rescaled files."""
    ratio = right_scalar / left_scalar
    n = 0
    for fn in df[df["camera"] == "right"]["pose_fn"]:
        pose = np.load(fn)
        pose[:2] = pose[:2] * ratio
        np.save(fn, pose)
        n += 1
    return n
