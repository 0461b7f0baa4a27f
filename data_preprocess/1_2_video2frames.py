"""Extract per-frame jpgs at the target fps (reference data_preprocess/1_2_video2frames.py)."""
import argparse
import os

from generate_dataset_utils import dir_video2frames

parser = argparse.ArgumentParser(description="video to frames")
parser.add_argument("-b", "--base_dataset_path", type=str, required=True,
                    help="dataset root path")
parser.add_argument("-s", "--speaker", type=str, required=True)
parser.add_argument("-fps", type=int, default=15,
                    help="Frame rate to extract frames from videos.")
args = parser.parse_args()

DATASET_PATH = os.path.join(args.base_dataset_path, args.speaker)

if __name__ == "__main__":
    dir_video2frames(video_dir=os.path.join(DATASET_PATH, "videos"),
                     target_dir=os.path.join(DATASET_PATH, "frames"),
                     fps=args.fps)
