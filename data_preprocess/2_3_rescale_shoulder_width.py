"""Rescale a speaker's poses so their mean shoulder width matches Oliver's
(331.085 px) — reference data_preprocess/2_3_rescale_shoulder_width.py.

The scale factor (oliver_shoulder_dist / speaker_shoulder_dist) is computed over all
cleaned poses, applied to the x,y channels, and written under tmp/rescaled_pose_2d.
"""

import argparse
import os

import numpy as np

OLIVER_SHOULDER_DIST = 331.0850066245443  # reference 2_3:64-72
L_SHOULDER, R_SHOULDER = 5, 2  # pose-137 shoulder keypoints


def shoulder_distance(pose: np.ndarray) -> float:
    return float(np.linalg.norm(pose[:2, L_SHOULDER] - pose[:2, R_SHOULDER]))


def main():
    parser = argparse.ArgumentParser(description="rescale shoulder width")
    parser.add_argument("-b", "--base_dataset_path", type=str, required=True)
    parser.add_argument("-s", "--speaker", type=str, required=True)
    parser.add_argument("--skip", action="store_true",
                        help="copy poses through without rescaling (factor 1.0)")
    args = parser.parse_args()

    dataset_path = os.path.join(args.base_dataset_path, args.speaker)
    dir_cleaned = os.path.join(dataset_path, "tmp", "cleaned_pose_2d")
    dir_rescaled = os.path.join(dataset_path, "tmp", "rescaled_pose_2d")

    dists, files = [], []
    for vid_nm in sorted(os.listdir(dir_cleaned)):
        vid_dir = os.path.join(dir_cleaned, vid_nm)
        for pose_fn in sorted(os.listdir(vid_dir)):
            files.append((vid_nm, pose_fn))
            dists.append(shoulder_distance(np.load(os.path.join(vid_dir, pose_fn))))

    scale = 1.0 if (args.skip or not dists) else (
        OLIVER_SHOULDER_DIST / float(np.mean(dists)))
    print(f"speaker scale factor -> oliver: {scale:.6f}")

    for vid_nm, pose_fn in files:
        src = os.path.join(dir_cleaned, vid_nm, pose_fn)
        dst_dir = os.path.join(dir_rescaled, vid_nm)
        os.makedirs(dst_dir, exist_ok=True)
        pose = np.load(src)
        pose[:2, :] *= scale
        np.save(os.path.join(dst_dir, pose_fn), pose)


if __name__ == "__main__":
    main()
