"""Dataset registry (reference: ``core/datasets/__init__.py:4-14``)."""

from __future__ import annotations

from .gesture_dataset import DataLoader, GestureDataset
from .speakers_stat import available_speakers, get_speaker_stat, register_speaker_stat

DATASETS = {
    "GestureDataset": GestureDataset,
}


def get_dataset(name: str):
    if name not in DATASETS:
        raise KeyError(f"Unknown dataset: {name}; available: {sorted(DATASETS)}")
    return DATASETS[name]
