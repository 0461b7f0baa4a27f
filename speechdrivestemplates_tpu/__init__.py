"""speechdrivestemplates_tpu — a TPU-native (JAX/Flax/optax/orbax/Pallas) framework for
co-speech gesture synthesis with learned templates (capabilities of
ShenhanQian/SpeechDrivesTemplates, ICCV 2021), re-designed TPU-first.

Layer map (mirrors SURVEY.md §1 of this repo):
  config        — yacs-compatible config tree + the four reference presets
  ops           — pure array ops: mel frontend (jnp + Pallas), pose-space transforms,
                  torch-compatible resize, FGD metric
  models        — Flax modules: ConvNormRelu, SequenceGeneratorCNN,
                  PoseSequenceDiscriminator, Autoencoder (+ registry)
  datasets      — GestureDataset (numpy loader + prefetch), speaker stats, synthetic
                  fixture (+ registry)
  pipelines     — Voice2Pose / Pose2Pose task logic, functional jitted train steps,
                  Trainer engine (+ registry)
  parallel      — device mesh construction and sharding helpers (data parallel via
                  NamedSharding; XLA collectives over ICI/DCN)
  utils         — host-side I/O: logging, video/ffmpeg, keypoint visualization, audio IO
"""

__version__ = "0.1.0"

from .config import CfgNode, get_cfg_defaults  # noqa: F401
