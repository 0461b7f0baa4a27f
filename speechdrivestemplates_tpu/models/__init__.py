"""Model registry (reference: ``core/networks/__init__.py:6-19``).

``get_model(name)`` returns the Flax module *class*; pipelines construct it from cfg
via ``build_model(name, cfg)`` which maps reference config keys to module fields.
"""

from __future__ import annotations

from .autoencoder import Autoencoder, PoseSeqDecoder, PoseSeqEncoder
from .discriminator import PoseSequenceDiscriminator
from .generator import AudioEncoder, SequenceGeneratorCNN, UNet1D

MODELS = {
    "SequenceGeneratorCNN": SequenceGeneratorCNN,
    "PoseSequenceDiscriminator": PoseSequenceDiscriminator,
    "Autoencoder": Autoencoder,
    "PoseSeqEncoder": PoseSeqEncoder,
}


def get_model(name: str):
    if name not in MODELS:
        raise KeyError(f"Unknown model: {name}; available: {sorted(MODELS)}")
    return MODELS[name]


def _compute_dtype(cfg):
    import jax.numpy as jnp

    precision = cfg.TRAIN.PRECISION
    if precision == "bf16":
        return jnp.bfloat16
    if precision == "fp32":
        return None
    raise ValueError(
        f"TRAIN.PRECISION must be 'fp32' or 'bf16', got {precision!r}")


def build_model(name: str, cfg):
    """Construct a registered module from the reference config schema."""
    cls = get_model(name)
    dtype = _compute_dtype(cfg)
    if cls is SequenceGeneratorCNN:
        return cls(
            num_landmarks=cfg.DATASET.NUM_LANDMARKS,
            code_dim=cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION,
            norm=cfg.VOICE2POSE.GENERATOR.NORM,
            leaky=cfg.VOICE2POSE.GENERATOR.LEAKY_RELU,
            dtype=dtype,
            conv_mm=cfg.SYS.CONV_MM_GRAD,
        )
    if cls is PoseSequenceDiscriminator:
        return cls(leaky=cfg.VOICE2POSE.POSE_DISCRIMINATOR.LEAKY_RELU, dtype=dtype)
    if cls is Autoencoder:
        return cls(
            num_landmarks=cfg.DATASET.NUM_LANDMARKS,
            code_dim=cfg.POSE2POSE.AUTOENCODER.CODE_DIM,
            norm=cfg.POSE2POSE.AUTOENCODER.NORM,
            leaky=cfg.POSE2POSE.AUTOENCODER.LEAKY_RELU,
            dtype=dtype,
        )
    if cls is PoseSeqEncoder:
        # The frozen FGD encoder always mirrors the Pose2Pose AE hyperparameters
        # (reference voice2pose.py:74-77 constructs it from the same cfg).
        return cls(
            num_landmarks=cfg.DATASET.NUM_LANDMARKS,
            code_dim=cfg.POSE2POSE.AUTOENCODER.CODE_DIM,
            norm=cfg.POSE2POSE.AUTOENCODER.NORM,
            leaky=cfg.POSE2POSE.AUTOENCODER.LEAKY_RELU,
            dtype=dtype,
        )
    raise KeyError(name)
