"""Fused conv1+IN1 kernel (probes/conv1_pallas.py) vs the XLA lowering.

Runs the Pallas kernel in interpret mode on CPU.  float32 must match a
plain-XLA conv+InstanceNorm+LeakyReLU to round-off; bfloat16 (the flagship
serving configuration) within bf16 tolerance.  Also asserts the layout
contract: zero h-border rows, and that layer 1 consuming the padded output
with padding=(0, 1) reproduces the reference layer-0+1 composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechdrivestemplates_tpu.models.blocks import NORM_EPS
from probes import conv1_pallas as CP


def ref_layer(x, w, stride, slope=0.2):
    x = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    m = jnp.mean(x, axis=(1, 2), keepdims=True)
    v = jnp.var(x, axis=(1, 2), keepdims=True)
    x = (x - m) * jax.lax.rsqrt(v + NORM_EPS)
    return jnp.where(x > 0, x, slope * x)


def make_inputs(rng, batch, width):
    mel = rng.randn(batch, CP.H1, width).astype(np.float32)
    w1 = (rng.randn(3, 3, 1, 64) * 0.2).astype(np.float32)
    return mel, w1


@pytest.mark.parametrize("width", [427, 37])
def test_fp32_matches_xla(width):
    rng = np.random.RandomState(0)
    mel, w1 = make_inputs(rng, 2, width)
    ref = ref_layer(mel[..., None], w1, (1, 1))
    out = CP.fused_conv1_in(jnp.asarray(mel), jnp.asarray(w1),
                            dtype=jnp.float32, interpret=True)
    assert out.shape == (2, CP.ROWS, width, 64)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(out[:, -1]), 0.0)
    np.testing.assert_allclose(np.asarray(out[:, 1:-1]), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bf16_close_to_fp32(ref_tol=2e-2):
    rng = np.random.RandomState(1)
    mel, w1 = make_inputs(rng, 1, 160)
    ref = np.asarray(ref_layer(mel[..., None], w1, (1, 1)))
    out = np.asarray(CP.fused_conv1_in(jnp.asarray(mel), jnp.asarray(w1),
                                       dtype=jnp.bfloat16, interpret=True),
                     np.float32)
    err = np.abs(out[:, 1:-1] - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert err < ref_tol, err


def test_layer1_composition():
    """Padded output + layer-1 conv with padding=(0, 1) == reference
    layer0(p=1) -> layer1(k4 s2 p=1) composition."""
    rng = np.random.RandomState(2)
    mel, w1 = make_inputs(rng, 2, 67)
    w2 = (rng.randn(4, 4, 64, 64) * 0.05).astype(np.float32)

    y0 = ref_layer(mel[..., None], w1, (1, 1))
    ref = ref_layer(y0, w2, (2, 2))

    pad = CP.fused_conv1_in(jnp.asarray(mel), jnp.asarray(w1),
                            dtype=jnp.float32, interpret=True)
    x = jax.lax.conv_general_dilated(
        pad, jnp.asarray(w2), window_strides=(2, 2),
        padding=[(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    m = jnp.mean(x, axis=(1, 2), keepdims=True)
    v = jnp.var(x, axis=(1, 2), keepdims=True)
    x = (x - m) * jax.lax.rsqrt(v + NORM_EPS)
    x = jnp.where(x > 0, x, 0.2 * x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_supported_gate():
    assert not CP.conv1_supported(CP.MAX_W1 + 1, "IN", jnp.bfloat16)
    assert not CP.conv1_supported(160, "BN", jnp.bfloat16)
