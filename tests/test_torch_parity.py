"""Numerical parity vs the reference PyTorch networks.

Builds the reference's torch modules (imported read-only from /root/reference),
copies their randomly-initialized weights into our Flax modules via the checkpoint
importer, and compares forward outputs on identical inputs.  This pins conv padding,
norm semantics (incl. the IN-1d permute quirk), resize conventions, and layout
transposes end to end.  Skipped when the reference tree is absent.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_networks():
    sys.path.insert(0, REFERENCE)
    import torch  # noqa: F401

    from core.networks.keypoints_generation.generator import \
        SequenceGeneratorCNN as TorchGen
    from core.networks.keypoints_generation.discriminator import \
        PoseSequenceDiscriminator as TorchDisc
    from core.networks.poses_reconstruction.autoencoder import \
        Autoencoder as TorchAE

    return TorchGen, TorchDisc, TorchAE


def _cfg(norm="IN", code_dim=32, hierarchical=True):
    from speechdrivestemplates_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.VOICE2POSE.GENERATOR.NAME = "SequenceGeneratorCNN"
    cfg.VOICE2POSE.GENERATOR.NORM = norm
    cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION = code_dim
    cfg.VOICE2POSE.POSE_DISCRIMINATOR.NAME = "PoseSequenceDiscriminator"
    cfg.VOICE2POSE.POSE_DISCRIMINATOR.LEAKY_RELU = True
    cfg.POSE2POSE.AUTOENCODER.NAME = "Autoencoder"
    cfg.DATASET.HIERARCHICAL_POSE = hierarchical
    return cfg


def _import_from_torch_module(torch_module, flax_params, flax_stats, translate):
    from speechdrivestemplates_tpu.utils import torch_import as ti

    sd = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    ti.import_module_params(sd, "", flax_params, flax_stats,
                            getattr(ti, f"translate_{translate}"))
    return flax_params, flax_stats


@pytest.mark.slow
def test_generator_forward_parity(ref_networks, rng):
    import jax.numpy as jnp
    import torch

    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.utils.torch_import import _to_mutable

    TorchGen, _, _ = ref_networks
    cfg = _cfg(norm="IN", code_dim=32)

    torch.manual_seed(0)
    tgen = TorchGen(cfg).eval()

    ours = build_model("SequenceGeneratorCNN", cfg)
    mel = rng.randn(2, 80, 427).astype(np.float32)
    code = rng.randn(2, 32).astype(np.float32)
    import jax

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(mel), 64,
                          jnp.asarray(code), False)
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    _import_from_torch_module(tgen, params, stats, "generator")
    v2 = {"params": params}
    if stats:
        v2["batch_stats"] = stats

    with torch.no_grad():
        theirs = tgen(torch.from_numpy(mel), 64, torch.from_numpy(code)).numpy()
    ours_out = np.asarray(ours.apply(v2, jnp.asarray(mel), 64, jnp.asarray(code),
                                     False))
    assert ours_out.shape == theirs.shape == (2, 64, 2, 121)
    np.testing.assert_allclose(ours_out, theirs, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_generator_bn_forward_parity(ref_networks, rng):
    """s2g configuration: NORM='BN' exercises BatchNorm eval semantics
    (running stats + affine) end to end."""
    import jax
    import jax.numpy as jnp
    import torch

    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.utils.torch_import import _to_mutable

    TorchGen, _, _ = ref_networks
    cfg = _cfg(norm="BN", code_dim=None)

    torch.manual_seed(1)
    tgen = TorchGen(cfg)
    # randomize running stats so eval-mode BN is a real test, not 0/1 defaults
    with torch.no_grad():
        for m in tgen.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    tgen.eval()

    ours = build_model("SequenceGeneratorCNN", cfg)
    mel = rng.randn(2, 80, 427).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(mel), 64, None, True)
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    _import_from_torch_module(tgen, params, stats, "generator")
    v2 = {"params": params, "batch_stats": stats}

    with torch.no_grad():
        theirs = tgen(torch.from_numpy(mel), 64, None).numpy()
    ours_out = np.asarray(ours.apply(v2, jnp.asarray(mel), 64, None, False))
    np.testing.assert_allclose(ours_out, theirs, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_discriminator_forward_parity(ref_networks, rng):
    import jax
    import jax.numpy as jnp
    import torch

    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.utils.torch_import import _to_mutable

    _, TorchDisc, _ = ref_networks
    cfg = _cfg()

    torch.manual_seed(0)
    tdisc = TorchDisc(cfg).eval()

    ours = build_model("PoseSequenceDiscriminator", cfg)
    x = rng.randn(2, 63, 2, 121).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    _import_from_torch_module(tdisc, params, stats, "discriminator")
    v2 = {"params": params, "batch_stats": stats}

    with torch.no_grad():
        theirs = tdisc(torch.from_numpy(x)).numpy()
    ours_out = np.asarray(ours.apply(v2, jnp.asarray(x), False))
    np.testing.assert_allclose(ours_out, theirs, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_autoencoder_decoder_parity(ref_networks, rng):
    """External-code path is deterministic -> end-to-end decoder parity."""
    import jax
    import jax.numpy as jnp
    import torch

    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.utils.torch_import import _to_mutable

    _, _, TorchAE = ref_networks
    cfg = _cfg()

    torch.manual_seed(0)
    tae = TorchAE(cfg).eval()

    ours = build_model("Autoencoder", cfg)
    code = rng.randn(2, 32).astype(np.float32)
    poses = rng.randn(2, 64, 2, 121).astype(np.float32)
    variables = ours.init({"params": jax.random.PRNGKey(0),
                           "reparam": jax.random.PRNGKey(1)},
                          jnp.asarray(poses), 64, None, False)
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    _import_from_torch_module(tae, params, stats, "autoencoder")
    v2 = {"params": params, "batch_stats": stats}

    with torch.no_grad():
        theirs, _, _ = tae(None, 64, external_code=torch.from_numpy(code))
    ours_out, mu, logvar = ours.apply(v2, None, 64, jnp.asarray(code), False)
    np.testing.assert_allclose(np.asarray(ours_out), theirs.numpy(),
                               rtol=1e-3, atol=1e-4)

    # encoder parity via mu/logvar (deterministic given weights)
    with torch.no_grad():
        t_mu, t_logvar = tae.encoder(torch.from_numpy(poses))
    mu2, logvar2 = ours.apply(v2, jnp.asarray(poses), False,
                              method=lambda m, p, t: m.encoder(p, t))
    np.testing.assert_allclose(np.asarray(mu2), t_mu.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar2), t_logvar.numpy(),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_full_audio_to_pose_parity(ref_networks, rng):
    """Composite: waveform -> mel -> generator vs the torch oracle chain
    (torch.stft mel + reference generator with transplanted weights).  This is the
    whole reference Voice2PoseModel.forward inference path (voice2pose.py:125-126)."""
    import jax
    import jax.numpy as jnp
    import torch

    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.ops.mel import mel_filterbank, mel_spectrogram
    from speechdrivestemplates_tpu.utils.torch_import import _to_mutable

    TorchGen, _, _ = ref_networks
    cfg = _cfg(norm="IN", code_dim=32)

    torch.manual_seed(0)
    tgen = TorchGen(cfg).eval()

    audio = (rng.randn(2, 68266) * 0.1).astype(np.float32)
    code = rng.randn(2, 32).astype(np.float32)

    # torch oracle mel (== torchaudio MelSpectrogram with the reference params)
    x = torch.from_numpy(audio)
    window = torch.hann_window(400, periodic=True)
    spec = torch.stft(x, n_fft=512, hop_length=160, win_length=400, window=window,
                      center=True, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    power = spec.real ** 2 + spec.imag ** 2
    fb = torch.from_numpy(mel_filterbank())
    t_mel = torch.matmul(power.transpose(-1, -2), fb).transpose(-1, -2)
    with torch.no_grad():
        theirs = tgen(t_mel, 64, torch.from_numpy(code)).numpy()

    ours_model = build_model("SequenceGeneratorCNN", cfg)
    variables = ours_model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 80, 427)), 64,
                                jnp.zeros((1, 32)), False)
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    _import_from_torch_module(tgen, params, stats, "generator")
    v2 = {"params": params}
    if stats:
        v2["batch_stats"] = stats

    mel = mel_spectrogram(jnp.asarray(audio), impl="dft")
    ours = np.asarray(ours_model.apply(v2, mel, 64, jnp.asarray(code), False))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_mel_reference_params_shape():
    """68267-sample audio snapped to 68266 -> (80, 427) mel, matching the
    reference's torchaudio call (voice2pose.py:125)."""
    import jax.numpy as jnp

    from speechdrivestemplates_tpu.ops.mel import mel_spectrogram
    from speechdrivestemplates_tpu.utils.audio import parse_audio_length

    audio_length, num_frames = parse_audio_length(68267, 16000, 15)
    assert (audio_length, num_frames) == (68266, 64)
    out = mel_spectrogram(jnp.zeros((1, audio_length)))
    assert out.shape == (1, 80, 427)
