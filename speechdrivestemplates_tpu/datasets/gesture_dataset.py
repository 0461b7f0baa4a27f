"""Gesture dataset: per-clip npz archives + a clips csv, per-speaker z-scored poses.

Behavioral port of the reference's ``core/datasets/gesture_dataset.py:14-236`` with a
TPU-era loader design: no torch DataLoader — a plain numpy item pipeline plus a
thread-prefetched batcher (``DataLoader`` below) that hands the jitted train step
host-contiguous numpy batches (the step does its own device put / sharding).

Splits (reference :22-35): 'train'/'val' filter the ``processed_137.csv`` rows on the
``dataset`` column ('train' / 'dev'); 'demo' takes a wav path, a space-separated list
of wav paths, or a directory to sample from.

Item pipeline (reference :85-121): npz load -> crop/pad audio to AUDIO_LENGTH ->
first NUM_FRAMES poses (T,3,137) -> drop lower body (->122) -> root-center & drop root
(->121) -> optional global->parted re-rooting -> split coords/scores -> per-speaker
z-score.  The inverse (``get_final_results``) and the parted->global-renormalize
transform used by the FGD encoder live in ``ops.pose``; thin methods here bind them to
this dataset's speaker stats for API parity.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

from ..ops import pose as pose_ops
from ..utils.audio import crop_pad_audio, load_wav, parse_audio_length
from .speakers_stat import get_speaker_stat


class GestureDataset:
    """Map-style dataset mirroring the reference's constructor signature
    (root_dir, speaker, split, cfg, demo_input=None)."""

    def __init__(self, root_dir: str, speaker: str, split: str, cfg,
                 demo_input: Optional[str] = None):
        self.cfg = cfg.DATASET
        self.full_cfg = cfg
        assert speaker is not None, 'The speaker is "None"!'
        # multi-speaker: 'oliver+kubinec' trains on the union, with per-row
        # speaker stats (the reference is single-speaker; batches already carry
        # per-sample stats so the union costs nothing)
        self.speakers = speaker.replace("+", " ").split()
        self.speaker = self.speakers[0]
        self.root_dir = os.path.join(root_dir, self.speaker)
        self.split = split

        if split in ("train", "val"):
            want = "train" if split == "train" else "dev"
            frames = []
            for sp in self.speakers:
                sp_dir = os.path.join(root_dir, sp)
                df = self._read_csv(sp_dir)
                df = df[df["dataset"] == want].copy()
                df["_dir"] = sp_dir
                frames.append(df)
            self.clips = pd.concat(frames).reset_index(drop=True)
        elif split == "demo":
            if len(demo_input.split()) == 1 and os.path.isdir(demo_input):
                # deterministic (SURVEY §5): seeded shuffle over a SORTED
                # listing, so the same command samples the same clips — the
                # reference uses the global RNG here (gesture_dataset.py:30)
                # and is unreproducible
                file_list = sorted(os.listdir(demo_input))
                np.random.default_rng(cfg.SYS.SEED).shuffle(file_list)
                file_list = [f for f in file_list[:1000] if f.split(".")[-1] == "wav"]
                file_list = file_list[: cfg.DEMO.NUM_SAMPLES]
                self.clips = [os.path.join(demo_input, f) for f in file_list]
            else:
                self.clips = demo_input.split()
        else:
            raise NotImplementedError(f"Unknown split: {split}")

        if self.cfg.SUBSET is not None:
            self.clips = self.clips[: self.cfg.SUBSET]

        self._cache: Dict[int, Dict[str, Any]] = {}
        self._cache_lock = threading.Lock()
        self._soa: Optional[Dict[str, Any]] = None

    def materialize(self) -> Optional[Dict[str, Any]]:
        """Structure-of-arrays cache: every sample stacked once into contiguous
        (N, ...) arrays so a batch is a single vectorized gather per key
        instead of per-item dict stacking.  ~2.5x faster steady-state epochs
        than the per-item cache (bench_loader.py).  Only for CACHING=True
        train/val splits; returns None otherwise."""
        if self.split == "demo" or not self.cfg.CACHING:
            return None
        with self._cache_lock:
            if self._soa is not None:
                return self._soa
        samples = [self[i] for i in range(len(self))]  # serves warm _cache hits
        soa = _collate(samples)
        with self._cache_lock:
            self._soa = soa
            self._cache.clear()  # item-level cache is now redundant
        return self._soa

    def gather(self, indices) -> Dict[str, Any]:
        """Batch = fancy-indexed slice of the materialized arrays."""
        soa = self.materialize()
        import numpy as _np

        idx = _np.asarray(indices, dtype=_np.int64)

        def take(v):
            if isinstance(v, dict):
                return {k: take(vv) for k, vv in v.items()}
            if isinstance(v, list):
                return [v[int(i)] for i in idx]
            return v[idx]

        return {k: take(v) for k, v in soa.items()}

    # -- plumbing --------------------------------------------------------------
    def _read_csv(self, sp_dir: Optional[str] = None) -> pd.DataFrame:
        csv_path = os.path.join(sp_dir or self.root_dir, "processed_137.csv")
        if not os.path.exists(csv_path):
            raise FileNotFoundError(f"No csv file: {csv_path}")
        return pd.read_csv(csv_path)

    def __len__(self) -> int:
        return len(self.clips)

    def get_speaker_stat(self, speaker: str, num_kp: int, parted: bool):
        try:
            return get_speaker_stat(speaker, num_kp, parted)
        except KeyError:
            # custom speakers: auto-register the sidecar stats written by
            # data_preprocess/4_2 into <speaker_dir>/speaker_stat-{mode}.npz
            # (the reference requires hand-pasting arrays into speakers_stat.py)
            mode = "parted" if parted else "global"
            sidecar = os.path.join(os.path.dirname(self.root_dir), speaker,
                                   f"speaker_stat-{mode}.npz")
            if not os.path.exists(sidecar):
                raise
            from .speakers_stat import register_speaker_stat

            with np.load(sidecar, allow_pickle=True) as z:
                register_speaker_stat(speaker, z["mean"], z["std"],
                                      float(z["scale_factor"]), parted)
            return get_speaker_stat(speaker, num_kp, parted)

    # -- item pipeline -----------------------------------------------------------
    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if self.split == "demo":
            return self._demo_item(idx)

        if self.cfg.CACHING:
            with self._cache_lock:
                if self._soa is not None:  # post-materialize stragglers
                    def take1(v):
                        if isinstance(v, dict):
                            return {k: take1(vv) for k, vv in v.items()}
                        return v[idx]

                    return {k: take1(v) for k, v in self._soa.items()}
                if idx in self._cache:
                    return self._cache[idx]

        sample = self._load_item(idx)
        if self.cfg.CACHING:
            with self._cache_lock:
                self._cache[idx] = sample
        return sample

    def _load_item(self, idx: int) -> Dict[str, Any]:
        clip = self.clips.iloc[idx]
        speaker = clip["speaker"]
        clip_dir = clip["_dir"] if "_dir" in clip else self.root_dir
        clip_path = os.path.join(clip_dir, clip["pose_fn"])
        audio_length, num_frames = parse_audio_length(
            self.cfg.AUDIO_LENGTH, self.cfg.AUDIO_SR, self.cfg.FPS)
        stat = self.get_speaker_stat(speaker, 121,
                                     parted=self.cfg.HIERARCHICAL_POSE)

        native = None
        if self.cfg.NUM_LANDMARKS == 121:
            from .native_loader import load_clip_native

            native = load_clip_native(clip_path, self.cfg.NUM_FRAMES,
                                      self.cfg.HIERARCHICAL_POSE,
                                      stat["mean"], stat["std"], audio_length)
        if native is not None:
            normalized, poses_score, audio = native
        else:
            arr = np.load(clip_path)
            audio = np.asarray(arr["audio"], dtype=np.float32)
            audio = crop_pad_audio(audio, audio_length)

            poses_with_score = np.asarray(
                arr["pose"][: self.cfg.NUM_FRAMES, ...], dtype=np.float32)
            poses_with_score = pose_ops.remove_unused_kp(poses_with_score)
            rel = pose_ops.absolute_to_relative(poses_with_score)
            if self.cfg.HIERARCHICAL_POSE:
                rel = pose_ops.global_to_parted(rel)

            relative_poses = rel[:, :2, :]
            poses_score = np.repeat(rel[:, 2:, :], 2, axis=1)
            normalized = pose_ops.normalize_poses(
                relative_poses, stat["mean"], stat["std"], self.cfg.NUM_LANDMARKS
            ).astype(np.float32)

        sample = {
            "speaker": speaker,
            "audio": audio.astype(np.float32),
            "num_frames": np.int32(num_frames),
            "clip_index": np.int32(idx),
            "poses": normalized,
            "poses_score": poses_score.astype(np.float32),
            "speaker_stat": {k: np.asarray(v) for k, v in stat.items()},
            "anchors": {
                "hand_root_l": pose_ops.HAND_ROOT_L,
                "hand_root_r": pose_ops.HAND_ROOT_R,
                "head_root": pose_ops.HEAD_ROOT,
            },
        }
        # When training non-hierarchically, the FGD path re-normalizes predictions in
        # the *global* stats space inside the jitted step (reference
        # gesture_dataset.py:222-236) — ship those stats with the batch.
        if not self.cfg.HIERARCHICAL_POSE:
            sample["speaker_stat_global"] = {
                k: np.asarray(v)
                for k, v in self.get_speaker_stat(speaker, 121, False).items()}

        if self.cfg.CACHING:
            with self._cache_lock:
                self._cache[idx] = sample
        return sample

    def _demo_item(self, idx: int) -> Dict[str, Any]:
        feed = self.clips[idx]
        if feed.split(".")[-1] not in ("wav", "m4a"):
            raise NotImplementedError(
                f"Audio format {feed.split('.')[-1]} is not supported.")
        audio = load_wav(feed, self.cfg.AUDIO_SR)
        if self.cfg.MAX_DEMO_LENGTH is not None:
            max_length = self.cfg.MAX_DEMO_LENGTH * self.cfg.AUDIO_SR
            if len(audio) > max_length:
                # per-item seeded crop: same run -> same window (the
                # reference's np.random.randint is unreproducible)
                start = int(np.random.default_rng(
                    self.full_cfg.SYS.SEED + idx).integers(
                        0, len(audio) - max_length))
                audio = audio[start: start + max_length]
        audio_length, num_frames = parse_audio_length(
            len(audio), self.cfg.AUDIO_SR, self.cfg.FPS)
        if num_frames < self.cfg.NUM_FRAMES:
            # the generator's UNet has 6 stride-2 levels, so clips shorter
            # than one training window (NUM_FRAMES) underflow it — in the
            # reference too (its torch UNet hits zero-length convs the same
            # way).  Zero-pad short demo audio up to one window; the output
            # simply covers the padded silence.
            num_frames = self.cfg.NUM_FRAMES
            audio_length = int(num_frames * self.cfg.AUDIO_SR / self.cfg.FPS)
        audio = crop_pad_audio(audio, audio_length)
        stat = self.get_speaker_stat(self.speaker, 121, self.cfg.HIERARCHICAL_POSE)
        return {
            "speaker": self.speaker,
            "audio": audio.astype(np.float32),
            "clip_index": np.int32(idx),
            "speaker_stat": {k: np.asarray(v) for k, v in stat.items()},
            "num_frames": np.int32(num_frames),
        }

    # -- inverse transforms bound to this dataset (API parity) -------------------
    def get_final_results(self, poses, speaker_stat):
        return pose_ops.get_final_results(
            poses, speaker_stat["mean"], speaker_stat["std"],
            speaker_stat["scale_factor"], self.cfg.HIERARCHICAL_POSE,
            self.cfg.NUM_LANDMARKS)

    def transform_normalized_parted2global(self, poses, speaker):
        sp = speaker[0] if isinstance(speaker, (list, tuple, np.ndarray)) else speaker
        g = self.get_speaker_stat(sp, poses.shape[-1], False)
        p = self.get_speaker_stat(sp, poses.shape[-1], True)
        return pose_ops.transform_normalized_parted2global(
            poses, p["mean"], p["std"], g["mean"], g["std"], self.cfg.NUM_LANDMARKS)


def _collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of sample dicts into a batch dict (nested one level)."""
    out: Dict[str, Any] = {}
    for key, v0 in samples[0].items():
        if isinstance(v0, dict):
            out[key] = {k: np.stack([np.asarray(s[key][k]) for s in samples])
                        for k in v0}
        elif isinstance(v0, str):
            out[key] = [s[key] for s in samples]
        else:
            out[key] = np.stack([np.asarray(s[key]) for s in samples])
    return out


class DataLoader:
    """Minimal thread-prefetched batch loader (replaces torch DataLoader +
    DistributedSampler; per-host sharding handled by ``shard`` offsets).

    With ``num_shards > 1`` each host iterates a disjoint, epoch-shuffled subset —
    the jax.process_index()-based analog of DistributedSampler
    (reference trainer.py:71,90).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_shards: int = 1, shard_index: int = 0,
                 prefetch: int = 2, num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = max(1, prefetch)
        self.num_workers = num_workers
        self.epoch = 0
        self._executor = None
        if num_workers > 1:
            from .native_loader import native_available

            if not native_available():
                import logging

                logging.warning(
                    "DataLoader: SYS.NUM_WORKERS=%d but the native loader "
                    "(native/libsdt_dataio.so) is not built; worker threads "
                    "are GIL-bound on the numpy fallback and add no "
                    "parallelism. Build it with `make -C native` (or see "
                    "native/build.sh).", num_workers)

    def _get_executor(self):
        """Persistent item-level pool (one per loader, not one per batch)."""
        if self._executor is None:
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="sdt-loader")
        return self._executor

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            # pad to a multiple of shards so every host sees the same batch count
            per = -(-len(idx) // self.num_shards)
            pad = per * self.num_shards - len(idx)
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def index_batches(self) -> list:
        """The epoch's batch schedule as index arrays — the single source of
        batch composition for BOTH the host path (``__iter__``) and the
        device-resident cache path (trainer ``_device_prefetch``), so the two
        are bit-identical by construction."""
        indices = self._indices()
        batches = [indices[i: i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def __iter__(self):
        batches = self.index_batches()

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def fetch(b):
            ds = self.dataset
            if getattr(ds, "_soa", None) is not None:
                return ds.gather(b)  # steady state: one vectorized gather/key
            if self.num_workers > 1:
                # item-level thread pool: the native C++ loader releases the GIL,
                # so threads genuinely overlap npz parse + pose transforms
                ex = self._get_executor()
                batch = _collate(list(ex.map(lambda i: ds[int(i)], b)))
            else:
                batch = _collate([ds[int(i)] for i in b])
            # Promote the item cache to the SoA layout once every clip has been
            # seen (end of the first CACHING epoch): later epochs become gathers.
            if (hasattr(ds, "materialize")
                    and getattr(getattr(ds, "cfg", None), "CACHING", False)
                    and len(getattr(ds, "_cache", ())) >= len(ds)):
                ds.materialize()
            return batch

        if getattr(self.dataset, "_soa", None) is not None:
            # RAM-resident dataset: a batch is a ~3ms vectorized gather with no
            # IO to overlap, and the producer-thread handoff costs more than
            # the fetch itself (GIL switch latency per queue put/get).
            for b in batches:
                yield fetch(b)
            return

        def producer():
            try:
                for b in batches:
                    q.put(fetch(b))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


if __name__ == "__main__":
    # Headless-safe smoke test (reference gesture_dataset.py:239-277 renders with
    # cv2.imshow; here frames are written under /tmp).  Usage:
    #   python -m speechdrivestemplates_tpu.datasets.gesture_dataset [root] [speaker]
    import sys
    import tempfile

    from ..config import get_cfg_defaults
    from ..ops import pose as _pose_ops
    from ..utils.viz import vis_relative_pose_clip

    cfg = get_cfg_defaults()
    root = sys.argv[1] if len(sys.argv) > 1 else cfg.DATASET.ROOT_DIR
    speaker = sys.argv[2] if len(sys.argv) > 2 else "oliver"
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = speaker
    cfg.freeze()
    print(cfg)

    ds = GestureDataset(root, speaker, "train", cfg)
    print(f"{len(ds)} train clips")
    sample = ds[0]
    poses = sample["poses"]
    stat = sample["speaker_stat"]
    rel = _pose_ops.denormalize_poses(poses, stat["mean"], stat["std"])
    if cfg.DATASET.HIERARCHICAL_POSE:
        rel = _pose_ops.parted_to_global(rel)
    out_dir = tempfile.mkdtemp(prefix="sdt_dataset_smoke_")
    frames = vis_relative_pose_clip(rel[:8], (720, 1280))
    try:
        import cv2

        for i, fr in enumerate(frames):
            cv2.imwrite(f"{out_dir}/frame_{i:03d}.jpg", fr)
        print(f"wrote {len(frames)} rendered frames to {out_dir}")
    except Exception as e:  # pragma: no cover
        print(f"cv2 unavailable ({e}); skipping render")
