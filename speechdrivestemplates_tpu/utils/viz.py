"""Keypoint/skeleton visualization (host-side, cv2).

Functional port of the reference's ``core/utils/keypoint_visualization.py``: per-part
edge lists for 121/135/137-keypoint layouts, single-frame and clip renderers, the
pred|gt pair renderer (pred at 0.33W, gt at 0.67W), and the demo filmstrip
(every 8th frame on one long canvas).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

HAND_EDGES = [
    [[0, 1], [1, 2], [2, 3], [3, 4]],
    [[0, 5], [5, 6], [6, 7], [7, 8]],
    [[0, 9], [9, 10], [10, 11], [11, 12]],
    [[0, 13], [13, 14], [14, 15], [15, 16]],
    [[0, 17], [17, 18], [18, 19], [19, 20]],
]

FACE_EDGES = (
    [[i, i + 1] for i in range(16)]
    + [[17, 18], [18, 19], [19, 20], [20, 21]]
    + [[22, 23], [23, 24], [24, 25], [25, 26]]
    + [[27, 28], [28, 29], [29, 30]]
    + [[31, 32], [32, 33], [33, 34], [34, 35]]
    + [[36, 37], [37, 38], [38, 39], [39, 40], [40, 41], [41, 36]]
    + [[42, 43], [43, 44], [44, 45], [45, 46], [46, 47], [47, 42]]
    + [[48, 49], [49, 50], [50, 51], [51, 52], [52, 53], [53, 54], [54, 55],
       [55, 56], [56, 57], [57, 58], [58, 59], [59, 48]]
    + [[60, 61], [61, 62], [62, 63], [63, 64], [64, 65], [65, 66], [66, 67], [67, 60]]
)

# (num_pose, pose_edges) per supported layout (reference keypoint_visualization.py:49-69)
_LAYOUTS = {
    135: (23, [[0, 1], [0, 4], [1, 2], [4, 5], [2, 3], [5, 6]]),
    137: (25, [[1, 2], [1, 5], [2, 3], [3, 4], [5, 6], [6, 7]]),
    121: (9, [[1, 4], [1, 2], [2, 3], [4, 5], [5, 6]]),
}
_NUM_HAND, _NUM_FACE = 21, 70


def _draw_edges(img, kps, edges, color, size):
    for e in edges:
        p0 = (int(kps[e[0]][0]), int(kps[e[0]][1]))
        p1 = (int(kps[e[1]][0]), int(kps[e[1]][1]))
        cv2.line(img, p0, p1, color, size, cv2.LINE_AA)
    return img


def _draw_hand(img, kps, size):
    for idx, edges in enumerate(HAND_EDGES):
        color_lvl = 255 / 8 * (idx + 3)
        color = (255, color_lvl, 1 - color_lvl)
        _draw_edges(img, kps, edges, color, size)
    return img


def draw_body_parts(img, landmarks, size: int = 2):
    """Draw a full skeleton; ``landmarks``: (K, 2) points in pixel space."""
    if not _HAS_CV2:
        return img
    num_kp = landmarks.shape[0]
    if num_kp not in _LAYOUTS:
        raise NotImplementedError(f"Unsupported number of keypoints: {num_kp}")
    num_pose, pose_edges = _LAYOUTS[num_kp]
    pose = landmarks[:num_pose]
    face = landmarks[num_pose:num_pose + _NUM_FACE]
    hand_l = landmarks[num_pose + _NUM_FACE:num_pose + _NUM_FACE + _NUM_HAND]
    hand_r = landmarks[num_pose + _NUM_FACE + _NUM_HAND:
                       num_pose + _NUM_FACE + 2 * _NUM_HAND]
    _draw_edges(img, pose, pose_edges, (25, 175, 25), size + 2)
    _draw_edges(img, face, FACE_EDGES, (100, 100, 100), size)
    _draw_hand(img, hand_l, size + 1)
    _draw_hand(img, hand_r, size + 1)
    return img


def _blank(canvas_size):
    h, w = canvas_size
    return np.zeros([h, w, 3], dtype=np.uint8) + 255


def vis_relative_pose(relative_pose, canvas_size):
    """relative_pose: (2, K) root-relative -> white-canvas render, centered."""
    h, w = canvas_size
    img = _blank(canvas_size)
    pts = relative_pose.T + np.array([[w // 2, h // 2]])
    return draw_body_parts(img, pts)


def vis_relative_pose_clip(relative_poses, canvas_size):
    """(T, 2, K) -> (T, H, W, 3) uint8."""
    return np.array([vis_relative_pose(p, canvas_size) for p in relative_poses])


def vis_relative_pose_pair(pred, gt, canvas_size):
    h, w = canvas_size
    img = _blank(canvas_size)
    draw_body_parts(img, pred.T + np.array([[int(w * 0.33), h // 2]]))
    draw_body_parts(img, gt.T + np.array([[int(w * 0.67), h // 2]]))
    return img


def vis_relative_pose_pair_clip(preds, gts, canvas_size):
    return np.array([vis_relative_pose_pair(p, g, canvas_size)
                     for p, g in zip(preds, gts)])


def vis_train_npz(npz_path, out_dir=None, max_frames=None, align_image=False):
    """Offline inspector for a training clip npz: renders pose frames
    (reference keypoint_visualization.py:116-145 shows them interactively with
    cv2.imshow; this headless variant writes jpgs and returns the frame list).

    ``align_image=True`` draws each skeleton over the ORIGINAL video frame
    whose path is stored in the clip's ``imgs`` entry (as the reference's
    align_image mode does); frames whose image is missing/undecodable fall
    back to the flat canvas."""
    items = np.load(npz_path, allow_pickle=True)
    poses = items["pose"]  # (T, 3, 137)
    imgs = items["imgs"] if align_image and "imgs" in items else None
    frames = []
    n = len(poses) if max_frames is None else min(max_frames, len(poses))
    for i in range(n):
        img = None
        if imgs is not None and i < len(imgs) and _HAS_CV2:
            path = imgs[i]
            if isinstance(path, bytes):
                path = path.decode("utf-8")
            img = cv2.imread(str(path)) if path else None
        if img is None:
            img = np.zeros((720, 1280, 3), dtype=np.uint8) + 240
        draw_body_parts(img, poses[i].transpose(1, 0)[:, :2], size=2)
        frames.append(img)
        if out_dir is not None and _HAS_CV2:
            cv2.imwrite(f"{out_dir}/frame_{i:06d}.jpg", img)
    return frames


def vis_train_csv_dir(data_root, speaker, num_kp=137, out_dir=None,
                      align_image=False, max_frames=None, max_clips=None,
                      csv_path=None):
    """Batch-inspect every clip listed in a training csv (reference
    keypoint_visualization.py:149-160, headless).  Accepts either the
    reference's ``train_<speaker>_<num_kp>_3.csv`` (absolute pose_fn paths) or
    this repo's ``<root>/<speaker>/processed_137.csv`` (pose_fn relative to the
    speaker dir).  Writes per-clip frame jpgs under ``out_dir/<clip_stem>/``
    and returns the list of clip paths rendered."""
    import csv as _csv
    import os

    speaker_dir = os.path.join(data_root, speaker)
    if csv_path is None:
        csv_path = os.path.join(data_root, f"train_{speaker}_{num_kp}_3.csv")
        if not os.path.exists(csv_path):
            csv_path = os.path.join(speaker_dir, "processed_137.csv")
    if not os.path.exists(csv_path):
        raise FileNotFoundError(csv_path)

    rendered = []
    with open(csv_path, newline="") as f:
        for row in _csv.DictReader(f):
            npz_path = row["pose_fn"]
            if not os.path.isabs(npz_path):
                npz_path = os.path.join(speaker_dir, npz_path)
            clip_out = None
            if out_dir is not None:
                clip_out = os.path.join(
                    out_dir, os.path.splitext(os.path.basename(npz_path))[0])
                os.makedirs(clip_out, exist_ok=True)
            vis_train_npz(npz_path, out_dir=clip_out, max_frames=max_frames,
                          align_image=align_image)
            rendered.append(npz_path)
            if max_clips is not None and len(rendered) >= max_clips:
                break
    return rendered


def vis_pose_npy(npy_path, out_path=None):
    """Offline inspector for a single-frame pose npy (reference :162-171)."""
    pose = np.load(npy_path)
    img = np.zeros((720, 1280, 3), dtype=np.uint8)
    draw_body_parts(img, pose.T[:, :2] if pose.shape[0] == 3 else pose[:, :2])
    if out_path is not None and _HAS_CV2:
        cv2.imwrite(out_path, img)
    return img


def draw_pose_frames_in_long_img(poses):
    """(T, K, 2) -> one long filmstrip image, every 8th frame
    (reference keypoint_visualization.py:96-110)."""
    N = poses.shape[0]
    interval = 8
    poses = poses[: N - N % interval + 1]
    N = poses.shape[0] // interval + 1
    H = 720
    w = H // 3 * 4
    pose_step = H * 0.7
    W = w + int((N - 1) * pose_step)
    canvas = np.zeros([H, W, 3], dtype=np.uint8) + 255
    for i in range(poses.shape[0]):
        if i % interval == 0:
            x0 = int(i // interval * pose_step)
            window = canvas[:, x0: x0 + w, :]
            draw_body_parts(window, poses[i] + np.array([[w // 2, H // 2]]))
    return canvas


if __name__ == "__main__":
    # Headless offline inspectors (reference keypoint_visualization.py:210-215
    # runs vis_train_csv_dir from __main__; here both inspectors are exposed):
    #   python -m speechdrivestemplates_tpu.utils.viz npz <clip.npz> [-o DIR]
    #       [--align-image] [--max-frames N]
    #   python -m speechdrivestemplates_tpu.utils.viz csv <data_root> <speaker>
    #       [-o DIR] [--align-image] [--max-clips N] [--csv PATH]
    import argparse
    import tempfile

    ap = argparse.ArgumentParser(description="offline keypoint inspectors")
    sub = ap.add_subparsers(dest="cmd", required=True)
    np_p = sub.add_parser("npz", help="render one training clip npz")
    np_p.add_argument("npz_path")
    np_p.add_argument("-o", "--out_dir", default=None)
    np_p.add_argument("--align-image", action="store_true",
                      help="draw over the clip's original video frames")
    np_p.add_argument("--max-frames", type=int, default=None)
    cs_p = sub.add_parser("csv", help="batch-inspect every clip in a csv")
    cs_p.add_argument("data_root")
    cs_p.add_argument("speaker")
    cs_p.add_argument("-o", "--out_dir", default=None)
    cs_p.add_argument("--align-image", action="store_true")
    cs_p.add_argument("--max-frames", type=int, default=None)
    cs_p.add_argument("--max-clips", type=int, default=None)
    cs_p.add_argument("--csv", dest="csv_path", default=None)
    args = ap.parse_args()

    out = args.out_dir or tempfile.mkdtemp(prefix="sdt_viz_")
    if args.cmd == "npz":
        frames = vis_train_npz(args.npz_path, out_dir=out,
                               max_frames=args.max_frames,
                               align_image=args.align_image)
        print(f"rendered {len(frames)} frames to {out}")
    else:
        clips = vis_train_csv_dir(args.data_root, args.speaker, out_dir=out,
                                  align_image=args.align_image,
                                  max_frames=args.max_frames,
                                  max_clips=args.max_clips,
                                  csv_path=args.csv_path)
        print(f"rendered {len(clips)} clips to {out}")
