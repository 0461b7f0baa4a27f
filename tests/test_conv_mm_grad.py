"""SYS.CONV_MM_GRAD: patches-matmul stem convs are drop-in equivalent.

The flag swaps the AudioEncoder's >1-channel 2D convs for PatchesConv
(patch extraction + one dot_general, so autodiff emits matmul gradients
instead of XLA's conv-backward kernels — the candidate fix for the measured
batch-128 train-MFU gap, docs/PERF.md "train speed-of-light").  It must be
invisible everywhere else: identical param tree (checkpoint interop),
identical forward, identical gradients up to float reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechdrivestemplates_tpu.models.generator import SequenceGeneratorCNN


@pytest.fixture(scope="module")
def generators():
    base = SequenceGeneratorCNN(num_landmarks=121, code_dim=32, norm="IN",
                                leaky=True, conv_mm=False)
    mm = SequenceGeneratorCNN(num_landmarks=121, code_dim=32, norm="IN",
                              leaky=True, conv_mm=True)
    rng = jax.random.PRNGKey(0)
    t_mel, T = 301, 45
    variables = base.init(rng, jnp.zeros((1, 80, t_mel)), T,
                          jnp.zeros((1, 32)), False)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 80, t_mel)) * 0.3
    code = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    return base, mm, variables, mel, T, code


def test_param_tree_identical(generators):
    base, mm, variables, mel, T, code = generators
    v_mm = mm.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, mel.shape[-1])),
                   T, jnp.zeros((1, 32)), False)
    ref_shapes = jax.tree.map(jnp.shape, variables)
    mm_shapes = jax.tree.map(jnp.shape, v_mm)
    assert ref_shapes == mm_shapes


def test_forward_equal(generators):
    base, mm, variables, mel, T, code = generators
    out_a = np.asarray(base.apply(variables, mel, T, code, False))
    out_b = np.asarray(mm.apply(variables, mel, T, code, False))
    # same params, same math — only the contraction order differs
    np.testing.assert_allclose(out_a, out_b, atol=2e-4, rtol=1e-5)


def test_single_layer_gradients_equal():
    """Isolated-layer check (no cross-layer error amplification): PatchesConv
    grads == nn.Conv grads to fp32 reassociation (~1e-6 relative)."""
    from speechdrivestemplates_tpu.models.blocks import ConvNormRelu

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 100, 64)) * 0.5
    layer_a = ConvNormRelu(conv_type="2d", out_channels=64, downsample=True,
                           norm="IN", leaky=True, mm_grad=False)
    layer_b = ConvNormRelu(conv_type="2d", out_channels=64, downsample=True,
                           norm="IN", leaky=True, mm_grad=True)
    variables = layer_a.init(jax.random.PRNGKey(4), x, True)

    def loss(layer, params, x):
        return jnp.sum(layer.apply({"params": params}, x, True) ** 2)

    ga_w, ga_x = jax.grad(lambda p, x: loss(layer_a, p, x), (0, 1))(
        variables["params"], x)
    gb_w, gb_x = jax.grad(lambda p, x: loss(layer_b, p, x), (0, 1))(
        variables["params"], x)
    for a, b in ((ga_w["conv"]["kernel"], gb_w["conv"]["kernel"]),
                 (ga_x, gb_x)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)


def test_full_model_gradients_close(generators):
    """Whole-generator gradients: train-mode IN statistics amplify fp32
    reassociation layer-over-layer (8 stacked norms), so a fixed tolerance
    would be arbitrary.  Gate against a MEASURED chaos floor instead: the
    base model's own gradient sensitivity to a ~1-ulp relative input
    perturbation (same executable, same math — pure fp32 conditioning).  The
    formulation swap must sit within one decade of that floor; the tight
    per-layer equality above plus identical forwards is the hard pin."""
    base, mm, variables, mel, T, code = generators

    def grads(gen, mel_in):
        def loss(params):
            out = gen.apply({"params": params}, mel_in, T, code, True)
            return jnp.sum(out ** 2)

        return jax.grad(loss)(variables["params"])

    g_a = grads(base, mel)
    g_b = grads(mm, mel)
    g_chaos = grads(base, mel * (1.0 + 1e-7))

    def max_norm_dev(t1, t2):
        dev = 0.0
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(t2)}
        for k, va in jax.tree_util.tree_leaves_with_path(t1):
            va = np.asarray(va, np.float64)
            vb = np.asarray(flat2[jax.tree_util.keystr(k)], np.float64)
            scale = np.abs(va).max() + 1e-6
            dev = max(dev, float(np.abs(va - vb).max() / scale))
        return dev

    floor = max_norm_dev(g_a, g_chaos)
    swap = max_norm_dev(g_a, g_b)
    assert swap <= max(10 * floor, 1e-4), (
        f"formulation-swap gradient deviation {swap:.3e} exceeds 10x the "
        f"fp32 chaos floor {floor:.3e}")
