"""bf16-vs-fp32 accuracy deltas for the flagship configuration.

``__graft_entry__._flagship_cfg`` records TRAIN.PRECISION=bf16 as the bench
configuration; these tests bound how far the bf16 compute path drifts from
fp32 so that the recorded perf numbers belong to a *validated* configuration
(round-1 verdict item 2).  Parameters stay fp32 in both cases (Flax
``param_dtype`` default); only conv-stack compute dtype changes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.models import build_model

import os

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _cfg(precision):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.PRECISION = precision
    cfg.freeze()
    return cfg


def test_flagship_generator_bf16_tracks_fp32():
    """Relative L2 between bf16 and fp32 flagship forwards stays small.

    The generator output feeds an L2 regression loss in z-scored pose space;
    a few-percent relative deviation is invisible next to the loss scale
    (L2_dist ~ 1e2 on real data)."""
    gen32 = build_model("SequenceGeneratorCNN", _cfg("fp32"))
    gen16 = build_model("SequenceGeneratorCNN", _cfg("bf16"))

    B, T, t_mel = 2, 64, 427
    rng = jax.random.PRNGKey(0)
    variables = gen32.init(rng, jnp.zeros((1, 80, t_mel)), T,
                           jnp.zeros((1, 32)), False)
    mel = jax.random.normal(jax.random.PRNGKey(1), (B, 80, t_mel)) * 2.0
    code = jax.random.normal(jax.random.PRNGKey(2), (B, 32))

    out32 = np.asarray(jax.jit(
        lambda v, m, c: gen32.apply(v, m, T, c, False))(variables, mel, code),
        dtype=np.float64)
    out16 = np.asarray(jax.jit(
        lambda v, m, c: gen16.apply(v, m, T, c, False))(variables, mel, code),
        dtype=np.float64)

    assert out16.dtype == np.float64 and out32.shape == out16.shape
    rel_l2 = np.linalg.norm(out16 - out32) / (np.linalg.norm(out32) + 1e-12)
    assert rel_l2 < 0.05, f"bf16 drifted {rel_l2:.4f} relative L2 from fp32"
    # and the outputs must be strongly correlated, not just small in norm
    corr = np.corrcoef(out16.ravel(), out32.ravel())[0, 1]
    assert corr > 0.999, corr


def test_flagship_forward_lowers_all_convs_bf16():
    """Pin the compute-dtype layout of the benchmarked serving forward: every
    convolution lowers with bf16 operands (the 2.4x bf16 win in docs/PERF.md),
    and the only fp32 dot_generals are the mel frontend's DFT/mel matmuls
    (deliberately fp32 at HIGHEST precision — bf16x3 on the MXU).  A silent
    promotion back to f32 convs (e.g. a dtype plumbing regression in
    ConvNormRelu) would invalidate the recorded perf numbers long before any
    accuracy test noticed."""
    import re
    import sys
    from collections import Counter

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import entry

    fn, args = entry()
    txt = jax.jit(fn).lower(*args).as_text()

    def operand_sig(line):
        return tuple(re.findall(r"tensor<[^>]*x(f32|bf16|f64)[^>]*>", line))

    convs = Counter(operand_sig(l) for l in
                    re.findall(r"stablehlo\.convolution.*", txt))
    dots = Counter(operand_sig(l) for l in
                   re.findall(r"stablehlo\.dot_general.*", txt))
    assert convs and set(convs) == {("bf16", "bf16", "bf16")}, convs
    n_f32_dots = sum(n for sig, n in dots.items() if "f32" in sig)
    assert n_f32_dots <= 3, dots  # the mel frontend only
    assert dots.get(("bf16", "bf16", "bf16"), 0) >= 1, dots


def test_flagship_train_step_lowers_all_convs_bf16(tmp_path):
    """Same dtype pin for the full TRAIN step: the backward pass (conv
    transpose / filter-grad kernels, where the recorded train MFU lives) must
    also lower entirely with bf16 conv operands.  Forward-only pinning would
    miss a promotion inside jax.grad."""
    import re
    import sys
    from collections import Counter

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _flagship_cfg
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=0)
    cfg = _flagship_cfg()
    cfg.DATASET.ROOT_DIR = root
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.VALIDATE = False
    cfg.TRAIN.SAVE_VIDEO = False
    cfg.SYS.MESH.DATA = 1
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    batch = next(iter(pipe.train_dataloader))
    txt = pipe._get_train_step().lower(
        pipe.state, pipe._device_batch(batch), jax.random.PRNGKey(0)).as_text()

    def sig(line):
        return tuple(re.findall(r"tensor<[^>]*x(f32|bf16|f64)[^>]*>", line))

    convs = Counter(sig(l) for l in re.findall(r"stablehlo\.convolution.*", txt))
    dots = Counter(sig(l) for l in re.findall(r"stablehlo\.dot_general.*", txt))
    assert convs and set(convs) == {("bf16", "bf16", "bf16")}, convs
    assert sum(n for s, n in dots.items() if "f32" in s) <= 3, dots  # mel only


@pytest.mark.slow
def test_flagship_train_losses_bf16_tracks_fp32(tmp_path):
    """One full SDT-BP train step: bf16 losses within a few % of fp32."""
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    root = tmp_path / "speakers"
    make_synthetic_speaker(str(root), "oliver", num_train=4, num_dev=0)

    def one_step(precision):
        cfg = get_cfg_defaults()
        cfg.merge_from_file(os.path.join(CONFIG_DIR, "voice2pose_sdt_bp.yaml"))
        cfg.DATASET.SPEAKER = "oliver"
        cfg.DATASET.ROOT_DIR = str(root)
        cfg.TRAIN.BATCH_SIZE = 4
        cfg.TRAIN.VALIDATE = False
        cfg.TRAIN.SAVE_VIDEO = False
        cfg.SYS.MESH.DATA = 1
        cfg.TRAIN.PRECISION = precision
        cfg.freeze()
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        batch = next(iter(pipe.train_dataloader))
        _, losses, _ = pipe._get_train_step()(
            pipe.state, pipe._device_batch(batch), jax.random.PRNGKey(0))
        return {k: float(np.asarray(v)) for k, v in losses.items()}

    l32, l16 = one_step("fp32"), one_step("bf16")
    for key in ["G_loss", "G_reg_loss", "L2_dist"]:
        rel = abs(l16[key] - l32[key]) / (abs(l32[key]) + 1e-9)
        assert rel < 0.05, (key, l32[key], l16[key], rel)
