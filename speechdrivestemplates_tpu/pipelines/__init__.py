"""Pipeline registry (reference: ``core/pipelines/__init__.py:5-16``)."""

from __future__ import annotations

from .pose2pose import Pose2Pose
from .trainer import Trainer
from .voice2pose import Voice2Pose

PIPELINES = {
    "Voice2Pose": Voice2Pose,
    "Pose2Pose": Pose2Pose,
}


def get_pipeline(name: str):
    if name not in PIPELINES:
        raise KeyError(f"Unknown pipeline: {name}; available: {sorted(PIPELINES)}")
    return PIPELINES[name]
