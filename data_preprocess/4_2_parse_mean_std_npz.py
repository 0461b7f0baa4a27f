"""Convert a mean_std npz from 137- to 121-keypoint space and register it
(reference data_preprocess/4_2_parse_mean_std_npz.py).

The reference pretty-prints the arrays for hand-pasting into speakers_stat.py; here
the 121-kp stats are ALSO written to ``<speaker_dir>/speaker_stat-{mode}.npz`` in
the runtime's format, so new speakers need no source edits
(see datasets/speakers_stat.py).

usage: python 4_2_parse_mean_std_npz.py <mean_std.npz> [--speaker NAME]
       [--scale_factor F] [--mode parted|global]
"""

import argparse
import os

import numpy as np

# 137 -> 121: drop root + lower body + ears (reference 4_2:16)
DELETE_IDX = [1] + list(range(8, 15)) + list(range(17, 25))


def formatted_print(digits):
    for i, val in enumerate(digits):
        print(val, end=", ")
        if i % 10 == 9:
            print()


def parse(npz_path: str):
    items = np.load(npz_path, allow_pickle=True)
    mean = np.delete(items["mean"], DELETE_IDX, axis=2)
    std = np.delete(items["std"], DELETE_IDX, axis=2)

    print("\nmean:", mean.shape)
    formatted_print(list(mean.reshape(-1)))
    print("\nstd:", std.shape)
    formatted_print(list(std.reshape(-1)))
    print("\n")
    return mean, std


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("npz_path")
    parser.add_argument("--speaker", type=str, default=None)
    parser.add_argument("--scale_factor", type=float, default=1.0)
    parser.add_argument("--mode", default="parted", choices=["parted", "global"])
    args = parser.parse_args()

    assert os.path.exists(args.npz_path)
    mean, std = parse(args.npz_path)

    if args.speaker is not None:
        out = os.path.join(os.path.dirname(args.npz_path),
                           f"speaker_stat-{args.mode}.npz")
        np.savez(out,
                 mean=mean.reshape(-1).astype(np.float64),
                 std=std.reshape(-1).astype(np.float64),
                 scale_factor=np.float64(args.scale_factor),
                 speaker=args.speaker,
                 parted=(args.mode == "parted"))
        print(f"saved runtime stat file: {out}")
