"""ctypes binding for the native (C++) data-loader core.

``load_clip_native`` runs the reference's whole train-item pipeline
(gesture_dataset.py:85-121) in C++ — npz parse, 137->121 selection, root-centering,
hierarchical re-rooting, z-scoring, audio crop/pad — releasing the GIL so loader
threads overlap host preprocessing with device steps.  Falls back silently when the
shared library hasn't been built (``native/build.sh``); ``GestureDataset`` uses it
opportunistically and the numpy path otherwise (both are tested to agree bit-wise
for float32 inputs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libsdt_dataio.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            build = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
            if os.path.exists(build):
                try:
                    subprocess.run(["sh", build], check=True,
                                   capture_output=True, timeout=120)
                except Exception:
                    return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sdt_load_clip.restype = ctypes.c_int
            lib.sdt_load_clip.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ]
            if lib.sdt_dataio_abi_version() != 1:
                return None
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def native_available() -> bool:
    if os.environ.get("SDT_DISABLE_NATIVE"):
        return False
    return _load_lib() is not None


def load_clip_native(path: str, num_frames: int, hierarchical: bool,
                     mean: np.ndarray, std: np.ndarray, audio_len: int):
    """Returns (poses (T,2,121) f32, scores (T,2,121) f32, audio (audio_len,) f32)
    or None when the native library is unavailable or the clip is malformed."""
    if os.environ.get("SDT_DISABLE_NATIVE"):  # bench/debug escape hatch
        return None
    lib = _load_lib()
    if lib is None:
        return None
    poses = np.empty((num_frames, 2, 121), np.float32)
    scores = np.empty((num_frames, 2, 121), np.float32)
    audio = np.empty((audio_len,), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.sdt_load_clip(
        path.encode(), num_frames, int(hierarchical),
        mean.ctypes.data_as(fp), std.ctypes.data_as(fp),
        poses.ctypes.data_as(fp), scores.ctypes.data_as(fp),
        audio.ctypes.data_as(fp), audio_len)
    if rc != 0:
        return None
    return poses, scores, audio
