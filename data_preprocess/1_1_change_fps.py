"""Step 1.1 — re-encode raw videos at the pipeline frame rate (15 fps).

CLI surface matches the reference (data_preprocess/1_1_change_fps.py):

    python 1_1_change_fps.py <dir_with_original_videos> <output_dir>
"""

from __future__ import annotations

import argparse
import os
import sys

from generate_dataset_utils import dir_change_fps


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Normalize every video in a directory to 15 fps.")
    parser.add_argument("video_dir", help="directory containing original videos")
    parser.add_argument("target_dir", help="directory for re-encoded videos")
    args = parser.parse_args(argv)

    if not os.path.isdir(args.video_dir):
        parser.error(f"not a directory: {args.video_dir}")
    dir_change_fps(video_dir=args.video_dir, target_dir=args.target_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
