"""Module shape traces (SURVEY.md §3.5) and torch-parity of layer semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from speechdrivestemplates_tpu.models import (
    Autoencoder, PoseSeqEncoder, PoseSequenceDiscriminator, SequenceGeneratorCNN)
from speechdrivestemplates_tpu.models.blocks import ConvNormRelu


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_convnormrelu_shapes(key):
    m = ConvNormRelu("1d", 256, downsample=True, norm="IN", leaky=True)
    x = jnp.zeros((2, 64, 128))
    v = m.init(key, x, True)
    y = m.apply(v, x, True)
    assert y.shape == (2, 32, 256)


def test_convnormrelu_in1d_quirk_matches_torch(key, rng):
    """Reference IN-1d applies InstanceNorm over the channel axis at each position
    (building_blocks.py:50-52).  Check our layer norm matches the torch computation."""
    x = rng.randn(2, 8, 16).astype(np.float32)  # (B, T, C)
    xt = torch.from_numpy(x)  # reference permutes (B,C,T)->(B,T,C); ours is already that
    out_t = F.instance_norm(xt, eps=1e-5).numpy()  # normalizes over last dim per (b, t)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ours = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(ours, out_t, rtol=1e-4, atol=1e-5)


def test_conv_downsample_matches_torch_padding(key, rng):
    """k=4,s=2,p=1 conv output length parity with torch for odd/even lengths."""
    for L in [64, 63, 31, 427]:
        m = ConvNormRelu("1d", 8, downsample=True, norm="IN")
        x = jnp.zeros((1, L, 4))
        v = m.init(key, x, True)
        y = m.apply(v, x, True)
        expected = (L + 2 - 4) // 2 + 1
        assert y.shape[1] == expected, (L, y.shape)


def test_generator_shape_trace(key):
    """SURVEY §3.5: audio (B,68266) -> mel (B,80,427) -> poses (B,64,2,121)."""
    B, T = 2, 64
    mel = jnp.zeros((B, 80, 427))
    code = jnp.zeros((B, 32))
    m = SequenceGeneratorCNN(num_landmarks=121, code_dim=32, norm="IN", leaky=True)
    v = m.init(key, mel, T, code, True)
    y = m.apply(v, mel, T, code, True)
    assert y.shape == (B, T, 2, 121)


def test_generator_no_code(key):
    mel = jnp.zeros((1, 80, 427))
    m = SequenceGeneratorCNN(num_landmarks=121, code_dim=None, norm="BN", leaky=True)
    v = m.init(key, mel, 64, None, True)
    y, updates = m.apply(v, mel, 64, None, True, mutable=["batch_stats"])
    assert y.shape == (1, 64, 2, 121)
    assert "batch_stats" in updates


def test_generator_variable_length(key):
    """The fully-convolutional design must work at other (static) lengths."""
    m = SequenceGeneratorCNN(num_landmarks=121, code_dim=None, norm="IN", leaky=True)
    mel1 = jnp.zeros((1, 80, 427))
    v = m.init(key, mel1, 64, None, True)
    mel2 = jnp.zeros((1, 80, 801))  # ~8 s
    y = m.apply(v, mel2, 120, None, False)
    assert y.shape == (1, 120, 2, 121)


def test_discriminator_shape(key):
    m = PoseSequenceDiscriminator(leaky=True)
    x = jnp.zeros((2, 63, 2, 121))  # motion-diff input T-1
    v = m.init(key, x, True)
    y, _ = m.apply(v, x, True, mutable=["batch_stats"])
    assert y.ndim == 2 and y.shape[0] == 2


def test_autoencoder_shapes(key):
    m = Autoencoder(num_landmarks=121, code_dim=32, norm="BN", leaky=True)
    poses = jnp.zeros((2, 64, 2, 121))
    v = m.init({"params": key, "reparam": key}, poses, 64, None, True)
    (recon, mu, logvar), _ = m.apply(
        v, poses, 64, None, True,
        rngs={"reparam": key}, mutable=["batch_stats"])
    assert recon.shape == (2, 64, 2, 121)
    assert mu.shape == (2, 32) and logvar.shape == (2, 32)


def test_autoencoder_external_code(key):
    m = Autoencoder(num_landmarks=121, code_dim=32, norm="BN", leaky=True)
    poses = jnp.zeros((1, 64, 2, 121))
    v = m.init({"params": key, "reparam": key}, poses, 64, None, True)
    code = jnp.ones((1, 32))
    (recon, mu, logvar), _ = m.apply(v, None, 64, code, False, mutable=["batch_stats"])
    assert recon.shape == (1, 64, 2, 121)
    np.testing.assert_array_equal(np.asarray(mu), np.ones((1, 32)))
    np.testing.assert_array_equal(np.asarray(logvar), np.zeros((1, 32)))


def test_pose_encoder_latent_interleave(key):
    """Even channels -> mu, odd -> logvar (autoencoder.py:34-35)."""
    m = PoseSeqEncoder(num_landmarks=121, code_dim=4, norm="BN", leaky=True)
    poses = jnp.zeros((2, 64, 2, 121))
    v = m.init(key, poses, True)
    mu, logvar = m.apply(v, poses, False)
    assert mu.shape == (2, 4) and logvar.shape == (2, 4)


def test_generator_param_count_sane(key):
    """The reference generator is ~10M params; ours must be in the same ballpark."""
    m = SequenceGeneratorCNN(num_landmarks=121, code_dim=32, norm="IN", leaky=True)
    v = m.init(key, jnp.zeros((1, 80, 427)), 64, jnp.zeros((1, 32)), True)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert 5e6 < n < 20e6, n
