"""Step 1.2 — extract per-frame jpgs from a speaker's videos.

CLI surface matches the reference (data_preprocess/1_2_video2frames.py):

    python 1_2_video2frames.py -b <dataset_root> -s <speaker> [-fps 15]

Reads  <root>/<speaker>/videos/*  and writes  <root>/<speaker>/frames/.
"""

from __future__ import annotations

import argparse
import os
import sys

from generate_dataset_utils import dir_video2frames


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="video to frames")
    parser.add_argument("-b", "--base_dataset_path", required=True,
                        help="dataset root path")
    parser.add_argument("-s", "--speaker", required=True)
    parser.add_argument("-fps", type=int, default=15,
                        help="Frame rate to extract frames from videos.")
    args = parser.parse_args(argv)

    speaker_dir = os.path.join(args.base_dataset_path, args.speaker)
    if not os.path.isdir(os.path.join(speaker_dir, "videos")):
        parser.error(f"no videos/ directory under {speaker_dir}")
    dir_video2frames(video_dir=os.path.join(speaker_dir, "videos"),
                     target_dir=os.path.join(speaker_dir, "frames"),
                     fps=args.fps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
