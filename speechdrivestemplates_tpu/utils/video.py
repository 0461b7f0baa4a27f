"""Multi-sink video saving (tensorboard / mp4 / long filmstrip jpg).

Reference: ``core/utils/video_processing.py:13-138``.  mp4 muxing prefers the ffmpeg
binary (frames + wav -> one file, as upstream); when ffmpeg is absent the writer falls
back to cv2.VideoWriter for the video track and leaves the wav beside it.  The
optional async queue+thread mirrors SYS.ASYNC_VIDEO_SAVING (reference :17-26).
"""

from __future__ import annotations

import logging
import os
import queue
import shutil
import subprocess
import threading
import time

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

_FFMPEG = shutil.which("ffmpeg")


class VideoWriter:
    def __init__(self, cfg) -> None:
        self.async_saving = bool(cfg.SYS.ASYNC_VIDEO_SAVING)
        if self.async_saving:
            self.q: "queue.Queue" = queue.Queue()
            threading.Thread(target=self._worker, daemon=True).start()

    def _worker(self):
        while True:
            func, args = self.q.get()
            try:
                func(*args)
            except Exception as e:  # pragma: no cover
                logging.warning("async video save failed: %s", e)
            self.q.task_done()

    def _dispatch(self, func, args):
        if self.async_saving:
            self.q.put((func, args))
        else:
            func(*args)

    def save_video(self, cfg, tag, frames, step, epoch, global_step=None,
                   long_img=None, audio=None, writer=None, base_path=None,
                   extra_id=None):
        if "tensorboard" in cfg.SYS.VIDEO_FORMAT:
            self._dispatch(self.save_video_in_tensorboard,
                           (cfg, tag, frames, step, epoch, global_step, writer, extra_id))
        if "mp4" in cfg.SYS.VIDEO_FORMAT:
            self._dispatch(self.save_video_in_mp4,
                           (cfg, tag, frames, step, epoch, global_step, audio,
                            base_path, extra_id))
        if "img" in cfg.SYS.VIDEO_FORMAT:
            self._dispatch(self.save_video_in_long_img,
                           (cfg, tag, long_img, step, epoch, global_step,
                            base_path, extra_id))

    # -- sinks -------------------------------------------------------------------
    def save_video_in_long_img(self, cfg, tag, long_img, step, epoch, global_step,
                               base_path, extra_id=None):
        if tag != "DEMO" or long_img is None or not _HAS_CV2:
            return
        tic = time.time()
        img_dir = os.path.join(base_path, "imgs")
        os.makedirs(img_dir, exist_ok=True)
        suffix = "" if extra_id is None else f"-{extra_id}"
        img_path = f"{img_dir}/epoch{epoch}-{tag}-step{step}{suffix}.jpg"
        cv2.imwrite(img_path, long_img)
        logging.info("[%s] epoch: %d/%d  step: %d  Saved long image in %.3f seconds.",
                     tag, epoch, cfg.TRAIN.NUM_EPOCHS, step, time.time() - tic)

    def save_video_in_tensorboard(self, cfg, tag, frames, step, epoch, global_step,
                                  writer, extra_id=None):
        if writer is None or tag == "DEMO":
            return
        tic = time.time()
        if tag == "TRAIN":
            clip_tag, tb_step = "train/video", global_step
        elif tag in ("VAL", "TEST"):
            clip_tag, tb_step = f"{tag.lower()}/video/{step}", epoch
        else:
            raise Exception(f"Unknown tag: {tag}")
        if extra_id is not None:
            clip_tag += f"/{extra_id}"
        # (T, H, W, 3) BGR uint8 -> (1, T, 3, h, w) RGB float, downscaled 0.4
        fr = frames[..., ::-1].astype(np.float32) / 255.0
        if _HAS_CV2:
            h, w = int(fr.shape[1] * 0.4), int(fr.shape[2] * 0.4)
            fr = np.stack([cv2.resize(f, (w, h), interpolation=cv2.INTER_AREA)
                           for f in fr])
        vid = np.transpose(fr, (0, 3, 1, 2))[None]
        writer.add_video(clip_tag, vid, tb_step, cfg.DATASET.FPS)
        logging.info("[%s] epoch: %d/%d  step: %d  Saved tensorboard videos in %.3f s.",
                     tag, epoch, cfg.TRAIN.NUM_EPOCHS, step, time.time() - tic)

    def save_video_in_mp4(self, cfg, tag, frames, step, epoch, global_step, audio,
                          base_path, extra_id=None):
        if not _HAS_CV2:
            return
        tic = time.time()
        vid_dir = os.path.join(base_path, "videos")
        os.makedirs(vid_dir, exist_ok=True)
        suffix = "" if extra_id is None else f"-{extra_id}"
        vid_path = f"{vid_dir}/epoch{epoch}-{tag}-step{step}{suffix}.mp4"
        wav_path = f"{vid_dir}/epoch{epoch}-{tag}-step{step}{suffix}.wav"

        if audio is not None:
            from scipy.io.wavfile import write as wav_write

            wav_write(wav_path, cfg.DATASET.AUDIO_SR, audio)

        if _FFMPEG is not None and audio is not None:
            self._mux_with_ffmpeg(frames, wav_path, vid_path, cfg.DATASET.FPS)
        else:
            self._write_with_cv2(frames, vid_path, cfg.DATASET.FPS)

        logging.info("[%s] epoch: %d/%d  step: %d  Saved mp4 videos in %.3f seconds.",
                     tag, epoch, cfg.TRAIN.NUM_EPOCHS, step, time.time() - tic)

    @staticmethod
    def _write_with_cv2(frames, vid_path, fps):
        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        for f in frames:
            vw.write(f.astype(np.uint8))
        vw.release()

    @staticmethod
    def _mux_with_ffmpeg(frames, wav_path, vid_path, fps):
        """Pipe raw frames to ffmpeg and mux with the wav in one pass (no jpg tmp dir,
        unlike the reference video_processing.py:100-124 — one process, zero disk churn)."""
        h, w = frames.shape[1:3]
        cmd = [
            _FFMPEG, "-y",
            "-f", "rawvideo", "-pix_fmt", "bgr24", "-s", f"{w}x{h}",
            "-r", str(fps), "-i", "pipe:0",
            "-i", wav_path,
            "-c:v", "libx264", "-pix_fmt", "yuv420p", "-c:a", "aac", "-shortest",
            vid_path,
        ]
        proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        proc.communicate(frames.astype(np.uint8).tobytes())
