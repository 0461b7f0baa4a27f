"""Generate 64-frame training clips (reference data_preprocess/3_1_generate_clips.py).

Per video: extract the audio track once with ffmpeg, then slide a 64-frame window
with stride FPS//3 = 5 over the pose sequence, writing one npz per clip
({pose (64,3,137), imgs (frame paths), audio (~68266 samples @16 kHz)}) plus a
per-video csv under tmp/intermediate_csv (consumed by 3_2).
"""

import argparse
import os

import numpy as np
import pandas as pd

from generate_dataset_utils import (FPS, FRAMES_PER_SAMPLE, SR, frame_idx_to_time,
                                    save_audio_sample_from_video)

parser = argparse.ArgumentParser(description="Extract data for the specified speaker")
parser.add_argument("-b", "--base_dataset_path", required=True)
parser.add_argument("-s", "--speaker", required=True)
parser.add_argument("-np", "--num_processes", type=int, default=1)
parser.add_argument("--restart", action="store_true")
parser.add_argument("-fi", "--start_frame_idx", type=int, default=80,
                    help="skip frames before this index (intros etc.)")
parser.add_argument("-nf", "--num_frames", type=int, default=FRAMES_PER_SAMPLE)
parser.add_argument("-d", "--debug", action="store_true")
args = parser.parse_args()

NUM_FRAMES = args.num_frames
DATASET_PATH = os.path.join(args.base_dataset_path, args.speaker)
FRAME_DIR_PATH = os.path.join(DATASET_PATH, "frames")
VIDEO_DIR_PATH = os.path.join(DATASET_PATH, "videos")
POSE_DIR_PATH = os.path.join(DATASET_PATH, "tmp", "rescaled_pose_2d")
TMPCSV_DIR_PATH = os.path.join(DATASET_PATH, "tmp", "intermediate_csv")
CLIP_AUDIO_DIR = os.path.join(DATASET_PATH, "clips", "audio")
CLIP_NPZ_DIR = os.path.join(DATASET_PATH, "clips", "npz")
LST_VIDEO_SUFFIX = [".mp4", ".MP4"]


def get_video_path(video_nm: str) -> str:
    for suffix in LST_VIDEO_SUFFIX:
        p = os.path.join(VIDEO_DIR_PATH, video_nm + suffix)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(video_nm)


def load_wav_16k(path: str) -> np.ndarray:
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from speechdrivestemplates_tpu.utils.audio import load_wav

    return load_wav(path, SR)


def gen_data_samples(video_nm: str, total_length: int, start_frame_idx: int):
    tmp_csv = os.path.join(TMPCSV_DIR_PATH, f"tmp_{video_nm}.csv")
    if os.path.exists(tmp_csv):
        return

    rows = []
    interval_start_t = frame_idx_to_time(start_frame_idx)
    interval_end_t = frame_idx_to_time(total_length)
    audio_out = os.path.join(CLIP_AUDIO_DIR,
                             f"{video_nm}-{interval_start_t}-{interval_end_t}.wav")
    save_audio_sample_from_video(get_video_path(video_nm), audio_out,
                                 interval_start_t, interval_end_t)
    wav = load_wav_16k(audio_out)

    stride = FPS // 3
    for frame_idx in range(start_frame_idx, total_length - NUM_FRAMES, stride):
        try:
            a0 = int((frame_idx - start_frame_idx) / FPS * SR)
            a1 = int((frame_idx + NUM_FRAMES - start_frame_idx) / FPS * SR)
            clip_wav = wav[a0:a1]

            poses = np.stack([
                np.load(os.path.join(POSE_DIR_PATH, video_nm,
                                     f"{video_nm}_{frame_idx + i:06d}.npy"))
                for i in range(NUM_FRAMES)])
            imgs = np.array([
                os.path.join(FRAME_DIR_PATH, video_nm,
                             f"{video_nm}_{frame_idx + i:06d}.jpg")
                for i in range(NUM_FRAMES)])

            npz_path = os.path.join(
                CLIP_NPZ_DIR, f"{video_nm}-{frame_idx}-{frame_idx + NUM_FRAMES}.npz")
            np.savez(npz_path, pose=poses, imgs=imgs, audio=clip_wav)

            rows.append({"dataset": "train", "start": frame_idx,
                         "end": frame_idx + NUM_FRAMES, "interval_id": video_nm,
                         "pose_fn": npz_path, "audio_fn": audio_out,
                         "video_fn": video_nm, "speaker": args.speaker})
        except Exception as e:
            if args.debug:
                print(f"ERROR! video: {video_nm}: {e}")
            continue
        if args.debug:
            break

    pd.DataFrame(rows).to_csv(tmp_csv, index=False)


if __name__ == "__main__":
    if args.restart and os.path.exists(TMPCSV_DIR_PATH):
        for f in os.listdir(TMPCSV_DIR_PATH):
            os.remove(os.path.join(TMPCSV_DIR_PATH, f))
    os.makedirs(TMPCSV_DIR_PATH, exist_ok=True)
    os.makedirs(CLIP_AUDIO_DIR, exist_ok=True)
    os.makedirs(CLIP_NPZ_DIR, exist_ok=True)
    assert os.path.exists(FRAME_DIR_PATH)
    assert os.path.exists(VIDEO_DIR_PATH)
    assert os.path.exists(POSE_DIR_PATH)

    for video_nm in sorted(os.listdir(FRAME_DIR_PATH)):
        total = len(os.listdir(os.path.join(FRAME_DIR_PATH, video_nm)))
        gen_data_samples(video_nm, total, args.start_frame_idx)
    print("Clips for each video generated. To split train and validation set")
