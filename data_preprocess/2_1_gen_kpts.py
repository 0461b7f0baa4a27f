"""OpenPose 2D keypoint extraction (reference data_preprocess/2_1_gen_kpts.py).

OpenPose is an optional offline dependency (C++/CUDA, via pyopenpose); it is only
needed when building a dataset from raw videos — the released datasets ship poses.
Per frame: 25 body + 70 face + 2x21 hand keypoints -> a (3, 137) npy; frames whose
detections are incomplete are skipped (reference 2_1:49-54).
"""

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser(description="generate keypoints with OpenPose")
parser.add_argument("-b", "--base_dataset_path", type=str, required=True)
parser.add_argument("-s", "--speaker", type=str, required=True)
parser.add_argument("--model_folder", type=str, default="models/",
                    help="OpenPose model folder")
args = parser.parse_args()

DATASET_PATH = os.path.join(args.base_dataset_path, args.speaker)
FRAME_DIR = os.path.join(DATASET_PATH, "frames")
OUT_DIR = os.path.join(DATASET_PATH, "tmp", "raw_pose_2d")


def main():
    try:
        import cv2
        from openpose import pyopenpose as op
    except ImportError as e:
        raise SystemExit(
            "pyopenpose is not installed. OpenPose (C++/CUDA) is an optional offline "
            "dependency used only for building new datasets from raw video; install "
            "it and re-run, or start from the released pose npz files.") from e

    params = {"model_folder": args.model_folder, "face": True, "hand": True}
    wrapper = op.WrapperPython()
    wrapper.configure(params)
    wrapper.start()

    for video_nm in sorted(os.listdir(FRAME_DIR)):
        in_dir = os.path.join(FRAME_DIR, video_nm)
        out_dir = os.path.join(OUT_DIR, video_nm)
        os.makedirs(out_dir, exist_ok=True)
        for frame_fn in sorted(os.listdir(in_dir)):
            datum = op.Datum()
            datum.cvInputData = cv2.imread(os.path.join(in_dir, frame_fn))
            wrapper.emplaceAndPop(op.VectorDatum([datum]))
            if (datum.poseKeypoints is None or datum.faceKeypoints is None
                    or datum.handKeypoints[0] is None
                    or datum.handKeypoints[1] is None):
                continue  # drop frames with incomplete detections
            kp = np.concatenate([
                datum.poseKeypoints[0],        # (25, 3)
                datum.faceKeypoints[0],        # (70, 3)
                datum.handKeypoints[0][0],     # (21, 3) left
                datum.handKeypoints[1][0],     # (21, 3) right
            ], axis=0).T                       # -> (3, 137)
            stem = os.path.splitext(frame_fn)[0]
            np.save(os.path.join(out_dir, f"{stem}.npy"), kp.astype(np.float32))


if __name__ == "__main__":
    main()
