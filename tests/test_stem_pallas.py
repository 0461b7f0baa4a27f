"""Fused audio-encoder stem kernel (probes/stem_pallas.py) vs the XLA lowering.

Runs the Pallas kernel in interpret mode on CPU.  The float32 mode must match
a plain-XLA reference of conv+InstanceNorm+LeakyReLU to round-off; bfloat16
mode (the flagship serving configuration) must stay within bf16 matmul
tolerance of the float32 reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechdrivestemplates_tpu.models.blocks import NORM_EPS
from probes import stem_pallas as SP


def ref_stem(mel, w1, w2, w3, slope=0.2):
    """First three AudioEncoder layers, plain XLA fp32 (mirrors
    models/blocks.py ConvNormRelu with norm='IN', eval mode)."""
    x = mel[..., None]
    for w, s in ((w1, (1, 1)), (w2, (2, 2)), (w3, (1, 1))):
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=s, padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        m = jnp.mean(x, axis=(1, 2), keepdims=True)
        v = jnp.var(x, axis=(1, 2), keepdims=True)
        x = (x - m) * jax.lax.rsqrt(v + NORM_EPS)
        x = jnp.where(x > 0, x, slope * x) if slope else jnp.maximum(x, 0.0)
    return x


def make_inputs(rng, batch, width):
    mel = rng.randn(batch, SP.H1, width).astype(np.float32)
    w1 = (rng.randn(3, 3, 1, 64) * 0.2).astype(np.float32)
    w2 = (rng.randn(4, 4, 64, 64) * 0.05).astype(np.float32)
    w3 = (rng.randn(3, 3, 64, 128) * 0.05).astype(np.float32)
    return mel, w1, w2, w3


@pytest.mark.parametrize("width", [35, 36, 427, 428])
def test_fused_stem_fp32_matches_xla(rng, width):
    mel, w1, w2, w3 = make_inputs(rng, 2, width)
    ref = np.asarray(ref_stem(jnp.asarray(mel), w1, w2, w3))
    got = np.asarray(SP.fused_audio_encoder_stem(
        jnp.asarray(mel), w1, w2, w3, slope=0.2, dtype=jnp.float32,
        interpret=True))
    assert got.shape == ref.shape == (2, 40, (width - 2) // 2 + 1, 128)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_fused_stem_relu_variant(rng):
    mel, w1, w2, w3 = make_inputs(rng, 1, 64)
    ref = np.asarray(ref_stem(jnp.asarray(mel), w1, w2, w3, slope=0.0))
    got = np.asarray(SP.fused_audio_encoder_stem(
        jnp.asarray(mel), w1, w2, w3, slope=0.0, dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_fused_stem_bf16_close_to_fp32(rng):
    mel, w1, w2, w3 = make_inputs(rng, 1, 101)
    ref = np.asarray(ref_stem(jnp.asarray(mel), w1, w2, w3))
    got = np.asarray(SP.fused_audio_encoder_stem(
        jnp.asarray(mel), w1, w2, w3, slope=0.2, dtype=jnp.bfloat16,
        interpret=True)).astype(np.float32)
    # bf16 matmuls with fp32 accumulation; post-IN activations are O(1)
    err = np.abs(got - ref)
    assert np.quantile(err, 0.99) < 0.05 and err.mean() < 0.02


def test_generator_forward_with_fused_stem(rng, monkeypatch):
    """SequenceGeneratorCNN with stem_weights routed through the kernel agrees
    with the plain path (same variables, same input)."""
    monkeypatch.setattr(SP, "_FORCE_INTERPRET", True)
    from speechdrivestemplates_tpu.models.generator import SequenceGeneratorCNN
    from probes.stem_pallas import stem_weights_from_params

    gen = SequenceGeneratorCNN(num_landmarks=121, code_dim=32, norm="IN",
                               leaky=True, dtype=None)
    T, t_mel = 32, 64  # T >= 32: the UNet's five stride-2 downsamples need it
    key = jax.random.PRNGKey(0)
    mel = jnp.asarray(rng.randn(2, 80, t_mel).astype(np.float32))
    code = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    variables = gen.init(key, mel[:1], T, code[:1], False)

    plain = gen.apply(variables, mel, T, code, False)
    sw = stem_weights_from_params(variables["params"])
    assert sw is not None and len(sw) == 3
    fused = gen.apply(variables, mel, T, code, False,
                      stem_weights=tuple(w.astype(jnp.float32) for w in sw))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=1e-3, atol=1e-4)


def test_stem_supported_gates():
    assert not SP.stem_supported(427, "BN", jnp.bfloat16)
    assert not SP.stem_supported(4, "IN", jnp.bfloat16)
    assert not SP.stem_supported(SP.MAX_W1 + 1, "IN", jnp.bfloat16)
    assert not SP.stem_supported(427, "IN", jnp.float32)


def test_pipeline_stem_gate(monkeypatch):
    """Voice2Pose._stem_weights gates on config, precision, width, backend."""
    import os

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.PRECISION = "bf16"
    cfg.SYS.FUSED_STEM = True
    cfg.SYS.MESH.DATA = 1  # pallas_call can't be auto-partitioned over a mesh
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    fake = {"audio_encoder": {f"ConvNormRelu_{i}": {"conv": {"kernel": i}}
                              for i in range(3)}}

    monkeypatch.setattr(SP, "_FORCE_INTERPRET", True)  # emulate a TPU backend
    assert pipe._stem_weights(fake, 427) == (0, 1, 2)
    assert pipe._stem_weights(fake, SP.MAX_W1 + 100) is None  # too wide
    assert pipe._stem_weights({"other": 1}, 427) is None      # foreign tree

    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.SYS.FUSED_STEM = False
    cfg2.freeze()
    assert get_pipeline(cfg2.PIPELINE_TYPE)(cfg2)._stem_weights(fake, 427) is None
    cfg3 = cfg.clone()
    cfg3.defrost()
    cfg3.TRAIN.PRECISION = "fp32"
    cfg3.freeze()
    assert get_pipeline(cfg3.PIPELINE_TYPE)(cfg3)._stem_weights(fake, 427) is None
    # >1-device data mesh: the eval batch is sharded, so the kernel must be
    # gated off (Mosaic kernels don't participate in automatic partitioning)
    cfg4 = cfg.clone()
    cfg4.defrost()
    cfg4.SYS.MESH.DATA = -1  # all 8 virtual devices under the test conftest
    cfg4.freeze()
    pipe4 = get_pipeline(cfg4.PIPELINE_TYPE)(cfg4)
    assert pipe4.mesh.size > 1 and pipe4._stem_weights(fake, 427) is None
