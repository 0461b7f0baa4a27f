"""Per-speaker pose normalization statistics.

The reference hardcodes ~1500 lines of per-speaker mean/std/scale tables in Python
source (``core/datasets/speakers_stat.py:4-1492``).  Here the same numeric data ships
as a compressed npz next to this module (``speakers_stat.npz``, keys
``{global|parted}/{speaker}/{mean,std,scale_factor}``) and is loaded lazily.  New
speakers produced by the data-prep toolchain (4_1/4_2 scripts) can be registered at
runtime via ``register_speaker_stat`` or dropped into a sidecar npz in the dataset
root — no source edits needed (the reference requires pasting arrays into code,
``data_preprocess/4_2_parse_mean_std_npz.py:15-31``).
"""

from __future__ import annotations

import os
import threading
from typing import Dict

import numpy as np

_STAT_PATH = os.path.join(os.path.dirname(__file__), "speakers_stat.npz")
_lock = threading.Lock()
_tables: Dict[str, Dict[str, Dict[str, np.ndarray]]] | None = None


def _load_tables() -> Dict[str, Dict[str, Dict[str, np.ndarray]]]:
    global _tables
    with _lock:
        if _tables is None:
            tables: Dict[str, Dict[str, Dict[str, np.ndarray]]] = {
                "global": {}, "parted": {}}
            with np.load(_STAT_PATH) as z:
                for key in z.files:
                    space, speaker, field = key.split("/")
                    tables[space].setdefault(speaker, {})[field] = z[key]
            _tables = tables
    return _tables


def register_speaker_stat(speaker: str, mean: np.ndarray, std: np.ndarray,
                          scale_factor: float, parted: bool) -> None:
    """Register stats for a new speaker at runtime (output of data_preprocess 4_x)."""
    tables = _load_tables()
    space = "parted" if parted else "global"
    mean = np.asarray(mean, dtype=np.float64).reshape(-1)
    std = np.asarray(std, dtype=np.float64).reshape(-1)
    assert mean.shape == std.shape
    tables[space][speaker] = {
        "mean": mean, "std": std, "scale_factor": np.float64(scale_factor)}


def get_speaker_stat(speaker: str, num_kp: int, parted: bool) -> Dict[str, np.ndarray]:
    """Lookup equivalent of the reference's
    ``eval(f'SPEAKERS_STAT_{num_kp}{"_parted" if parted else ""}')[speaker]``
    (gesture_dataset.py:167-171).  Only the 121-keypoint tables exist, as upstream.

    Returns float32 copies shaped for batching: mean/std (242,), scale_factor ().
    """
    if num_kp != 121:
        raise KeyError(f"no stats table for {num_kp} keypoints (only 121 exists)")
    tables = _load_tables()
    space = "parted" if parted else "global"
    if speaker not in tables[space]:
        raise KeyError(
            f"speaker {speaker!r} not in {space} stats table; known: "
            f"{sorted(tables[space])}")
    stat = tables[space][speaker]
    return {
        "mean": stat["mean"].astype(np.float32),
        "std": stat["std"].astype(np.float32),
        "scale_factor": np.float32(stat["scale_factor"]),
    }


def available_speakers(parted: bool) -> list[str]:
    return sorted(_load_tables()["parted" if parted else "global"])
