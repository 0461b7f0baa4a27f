"""Remove outlier pose frames (reference data_preprocess/2_2_remove_outlier.py).

A frame is an outlier when any keypoint-121 has both coordinates <= 3 (an OpenPose
miss near the origin).  Operates on copies under tmp/cleaned_pose_2d, vectorized
over all 121 keypoints per file (the reference loops per keypoint).
"""

import argparse
import os
import shutil

import numpy as np

from generate_dataset_utils import pose137_to_pose121


def is_pose_outlier(path: str) -> bool:
    pose = pose137_to_pose121(np.load(path))  # (3, 121)
    return bool(np.any(np.all(pose[:2, :] <= 3, axis=0)))


def main():
    parser = argparse.ArgumentParser(description="remove outliers")
    parser.add_argument("-b", "--base_dataset_path", type=str, required=True)
    parser.add_argument("-s", "--speaker", type=str, required=True)
    parser.add_argument("-np", "--num_processes", type=int, default=1)
    parser.add_argument("-d", "--debug", action="store_true")
    args = parser.parse_args()

    dataset_path = os.path.join(args.base_dataset_path, args.speaker)
    dir_raw = os.path.join(dataset_path, "tmp", "raw_pose_2d")
    dir_cleaned = os.path.join(dataset_path, "tmp", "cleaned_pose_2d")

    if not os.path.exists(dir_cleaned):
        print("Copying raw_pose_2d to cleaned_pose_2d...")
        shutil.copytree(dir_raw, dir_cleaned)
    else:
        print("cleaned_pose_2d dir already exists")

    for vid_nm in sorted(os.listdir(dir_cleaned)):
        vid_dir = os.path.join(dir_cleaned, vid_nm)
        removed = 0
        for pose_fn in sorted(os.listdir(vid_dir)):
            p = os.path.join(vid_dir, pose_fn)
            if is_pose_outlier(p):
                os.remove(p)
                removed += 1
        print(f"{vid_nm}: removed {removed} outlier frames")


if __name__ == "__main__":
    main()
