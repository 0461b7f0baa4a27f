"""2D convolution as patch extraction + one ``dot_general``.

Autodiff of a ``dot_general`` yields matmul gradients instead of XLA's
conv-transpose / conv-filter-grad kernels — the candidate fix for the measured
batch-128 train gap (docs/PERF.md "train speed-of-light": the 1.37x-floor
residue sits in conv-backward achieved bandwidth on the full-res stem planes
of the reference stem, core/networks/keypoints_generation/generator.py:8-43).

Single source of truth for the formulation: used by the model path
(``models.blocks.PatchesConv`` behind ``SYS.CONV_MM_GRAD``) and by the on-chip
A/B probe (``bench_profile.profile_conv_bwd``), so the probe always measures
exactly what the model runs.  Feature order of
``conv_general_dilated_patches`` is (C_in major, then kh, kw) — pinned by
tests/test_misc.py::test_conv_as_patches_matmul_matches_conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_as_patches_matmul(x, w, stride, padding):
    """NHWC conv with HWIO weights ``w``, expressed as patches + ONE matmul.

    Numerically matches ``lax.conv_general_dilated`` with
    ``preferred_element_type=float32`` accumulation; output dtype follows the
    patches (i.e. the input) dtype.
    """
    kh, kw, ci, co = w.shape
    p = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), tuple(stride), list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w_mat = jnp.transpose(w, (2, 0, 1, 3)).reshape(ci * kh * kw, co)
    return jax.lax.dot_general(
        p, w_mat.astype(p.dtype), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(p.dtype)
