"""Pure array ops: the numerical core of the framework.

Everything here is functional (no in-place mutation) and works under ``jax.jit``.
Modules:
  - ``pose``: keypoint-space transforms (137->122->121 selection, root-centering,
    hierarchical parted<->global re-rooting as a gather+FMA, per-speaker z-scoring).
  - ``mel``: torchaudio-parameter-compatible mel spectrogram (jnp reference path and
    an MXU-friendly DFT-matmul path; fused Pallas kernel in ``mel_pallas``).
  - ``fgd``: host-side Frechet gesture distance (float64 scipy, as the reference).
"""

from .pose import (  # noqa: F401
    remove_unused_kp,
    absolute_to_relative,
    parted_to_global,
    global_to_parted,
    normalize_poses,
    denormalize_poses,
    get_final_results,
    transform_normalized_parted2global,
)
from .mel import mel_spectrogram, mel_filterbank  # noqa: F401
