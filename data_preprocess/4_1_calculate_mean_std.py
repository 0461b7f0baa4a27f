"""Per-keypoint mean/std over the train split
(reference data_preprocess/4_1_calculate_mean_std.py).

Same statistics, vectorized: the reference runs a per-frame, per-keypoint Python
loop with a streaming mean (hours for a full speaker); here each clip contributes a
masked vectorized accumulation (undetected keypoints — |coord + root| < 5 on both
axes — are excluded, as upstream).  'parted' mode re-roots face at the nose and
hands at the wrists in pose-137 space before accumulating (reference 4_1:59-72).

Outputs mean_std-{mode}.npz with mean/std of shape (1, 2, 137), averaged over the
64 frame positions exactly like the reference's final double-average.
"""

import argparse
import os

import numpy as np
import pandas as pd

from generate_dataset_utils import deduct_root_global, deduct_root_parted


def accumulate(df_pose, mode: str):
    deduct = deduct_root_parted if mode == "parted" else deduct_root_global
    sum_ = np.zeros((64, 2, 137))
    sumsq = np.zeros((64, 2, 137))
    count = np.zeros((64, 1, 137))
    for pose_fn in df_pose:
        pose = np.load(pose_fn)["pose"].astype(np.float64)  # (64, 3, 137)
        centered, root = deduct(pose)
        # undetected keypoints sit near the origin pre-centering: centered + root ~ 0
        absolute = centered[:, :2, :] + root[:, :, None]
        valid = ~np.all(np.abs(absolute) < 5, axis=1, keepdims=True)  # (64, 1, 137)
        sum_ += centered[:, :2, :] * valid
        sumsq += centered[:, :2, :] ** 2 * valid
        count += valid
    return sum_, sumsq, count


def main():
    parser = argparse.ArgumentParser(description="calculate per-keypoint mean/std")
    parser.add_argument("-b", "--base_dataset_path", required=True)
    parser.add_argument("-s", "--speaker", required=True)
    parser.add_argument("-np", "--num_processes", type=int, default=10)
    parser.add_argument("-m", "--mode", default="parted",
                        choices=["parted", "global"])
    parser.add_argument("--mean", action="store_true", help="only calculate mean")
    parser.add_argument("--std", action="store_true", help="only calculate std")
    parser.add_argument("-d", "--debug", action="store_true")
    args = parser.parse_args()

    dataset_path = os.path.join(args.base_dataset_path, args.speaker)
    df = pd.read_csv(os.path.join(dataset_path, "clips.csv"))
    df_pose = df[df["dataset"] == "train"]["pose_fn"]
    if args.debug:
        df_pose = df_pose[:5]

    print(f"Using {args.mode} pose; {len(df_pose)} clips.")
    sum_, sumsq, count = accumulate(df_pose, args.mode)
    count = np.maximum(count, 1)
    mean = sum_ / count                              # (64, 2, 137)
    var = np.maximum(sumsq / count - mean ** 2, 0.0)
    std = np.sqrt(var)

    # average over the 64 frame positions -> (1, 2, 137), like the reference's
    # final np.average(..., axis=0) over frames
    mean_save = mean.mean(axis=0, keepdims=True)
    std_save = std.mean(axis=0, keepdims=True)

    out = os.path.join(dataset_path, f"mean_std-{args.mode}.npz")
    np.savez(out, mean=mean_save, std=std_save)
    print(f"saved {out}: mean {mean_save.shape}, std {std_save.shape}")


if __name__ == "__main__":
    main()
