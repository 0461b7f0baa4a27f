"""Checkpoint EXPORT to the reference's .pth format (utils/torch_export.py).

Direction-reversed counterpart of test_torch_parity.py: initialize OUR Flax
modules, export their weights as a reference-keyed torch state dict, load it
into the actual reference torch networks with ``strict=True`` (proving key
completeness), and compare forwards on identical inputs.  Plus an
import(export(x)) == x round trip through both translators.
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

    from core.networks.keypoints_generation.discriminator import \
        PoseSequenceDiscriminator as TorchDisc
    from core.networks.keypoints_generation.generator import \
        SequenceGeneratorCNN as TorchGen
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


def _init_flax(model, *args):
    import jax

    from speechdrivestemplates_tpu.utils.torch_import import _to_mutable

    variables = model.init(jax.random.PRNGKey(7), *args)
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    return params, stats


def _load_torch(module, sd_np, strict=True):
    import torch

    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd_np.items()}
    missing, unexpected = module.load_state_dict(tensors, strict=strict)
    return missing, unexpected


@pytest.mark.slow
def test_export_generator_strict_load_and_forward(ref_networks, rng):
    import jax.numpy as jnp
    import torch

    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.utils.torch_export import (
        export_module_params, reverse_generator)

    TorchGen, _, _ = ref_networks
    cfg = _cfg(norm="IN", code_dim=32)

    ours = build_model("SequenceGeneratorCNN", cfg)
    mel = rng.randn(2, 80, 427).astype(np.float32)
    code = rng.randn(2, 32).astype(np.float32)
    params, stats = _init_flax(ours, jnp.asarray(mel), 64, jnp.asarray(code),
                               False)

    sd = export_module_params(params, stats, "", reverse_generator)
    tgen = TorchGen(cfg)
    missing, unexpected = _load_torch(tgen, sd, strict=True)
    assert not missing and not unexpected
    tgen.eval()

    want = ours.apply({"params": params}, jnp.asarray(mel), 64,
                      jnp.asarray(code), False)
    with torch.no_grad():
        got = tgen(torch.from_numpy(mel), 64,
                   code=torch.from_numpy(code)).numpy()
    np.testing.assert_allclose(np.asarray(want), got, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_export_discriminator_and_autoencoder(ref_networks, rng):
    import jax.numpy as jnp
    import torch

    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.utils.torch_export import (
        export_module_params, reverse_autoencoder, reverse_discriminator)

    _, TorchDisc, TorchAE = ref_networks
    cfg = _cfg()

    # discriminator (has BatchNorm -> exercises running-stat export)
    disc = build_model("PoseSequenceDiscriminator", cfg)
    poses = rng.randn(2, 64, 2, 121).astype(np.float32)
    params, stats = _init_flax(disc, jnp.asarray(poses), False)
    sd = export_module_params(params, stats, "", reverse_discriminator)
    tdisc = TorchDisc(cfg)
    missing, unexpected = _load_torch(tdisc, sd, strict=True)
    assert not missing and not unexpected
    tdisc.eval()
    want = disc.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(poses), False)
    with torch.no_grad():
        got = tdisc(torch.from_numpy(poses)).numpy()
    np.testing.assert_allclose(np.asarray(want), got, rtol=2e-4, atol=2e-4)

    # autoencoder (external_code path -> deterministic, no reparam noise);
    # init WITHOUT external_code so the encoder's params materialize too
    ae = build_model("Autoencoder", cfg)
    code = rng.randn(2, 32).astype(np.float32)
    import jax

    variables = ae.init(
        {"params": jax.random.PRNGKey(3), "reparam": jax.random.PRNGKey(4)},
        jnp.asarray(poses), 64)
    from speechdrivestemplates_tpu.utils.torch_import import _to_mutable

    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    sd = export_module_params(params, stats, "", reverse_autoencoder)
    tae = TorchAE(cfg)
    missing, unexpected = _load_torch(tae, sd, strict=True)
    assert not missing and not unexpected
    tae.eval()
    want, _, _ = ae.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(poses), 64,
                          external_code=jnp.asarray(code), train=False)
    with torch.no_grad():
        got, _, _ = tae(torch.from_numpy(poses), 64,
                        external_code=torch.from_numpy(code))
    np.testing.assert_allclose(np.asarray(want), got.numpy(), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.slow
def test_export_import_round_trip(ref_networks, rng, tmp_path):
    """import(export(state)) reproduces the original tree bit-exactly, through
    a real .pth file in the reference checkpoint layout."""
    import jax
    import jax.numpy as jnp

    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.utils import torch_import as ti
    from speechdrivestemplates_tpu.utils.torch_export import (
        export_voice2pose, save_torch_checkpoint)

    cfg = _cfg(norm="IN", code_dim=32)
    gen = build_model("SequenceGeneratorCNN", cfg)
    disc = build_model("PoseSequenceDiscriminator", cfg)
    mel = jnp.asarray(rng.randn(2, 80, 427).astype(np.float32))
    code = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    poses = jnp.asarray(rng.randn(2, 64, 2, 121).astype(np.float32))

    gvars = gen.init(jax.random.PRNGKey(0), mel, 64, code, False)
    dvars = disc.init(jax.random.PRNGKey(1), poses, False)
    state = {
        "params_g": ti._to_mutable(gvars["params"]),
        "batch_stats_g": ti._to_mutable(gvars.get("batch_stats", {})),
        "params_d": ti._to_mutable(dvars["params"]),
        "batch_stats_d": ti._to_mutable(dvars.get("batch_stats", {})),
        "clips_code": jnp.asarray(rng.randn(8, 32).astype(np.float32)),
    }

    pth = str(tmp_path / "export.pth")
    save_torch_checkpoint(pth, export_voice2pose(state), epoch=5, step=50)

    back = ti.import_voice2pose(pth, state)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), state, back)


@pytest.mark.slow
def test_export_pose2pose_checkpoint(ref_networks, rng, tmp_path):
    """export_pose2pose -> .pth loads into the reference Pose2PoseModel
    (banks + AE weights + BN running stats), via the full-file path."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import jax
    import jax.numpy as jnp
    from _reference import install_reference_stubs

    torch = install_reference_stubs()
    from core.pipelines.pose2pose import Pose2PoseModel

    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.utils import torch_import as ti
    from speechdrivestemplates_tpu.utils.torch_export import (
        export_pose2pose, save_torch_checkpoint)

    cfg = _cfg()
    ae = build_model("Autoencoder", cfg)
    poses = jnp.asarray(rng.randn(2, 64, 2, 121).astype(np.float32))
    variables = ae.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        poses, 64)
    state = {
        "params_ae": ti._to_mutable(variables["params"]),
        "batch_stats_ae": ti._to_mutable(variables.get("batch_stats", {})),
        "clip_code_mu": jnp.asarray(rng.randn(8, 32).astype(np.float32)),
        "clip_code_logvar": jnp.asarray(rng.randn(8, 32).astype(np.float32)),
    }
    pth = str(tmp_path / "p2p.pth")
    save_torch_checkpoint(pth, export_pose2pose(state), epoch=3, step=30)

    # load the way the reference does: DataParallel-wrapped (reference
    # voice2pose.py:221-231) -> exported keys must carry 'module.'
    model = torch.nn.DataParallel(Pose2PoseModel(cfg, num_train_samples=8))
    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    assert (ckpt["epoch"], ckpt["step"]) == (3, 30)
    assert all(k.startswith("module.") for k in ckpt["model_state_dict"])
    missing, unexpected = model.load_state_dict(ckpt["model_state_dict"],
                                                strict=False)
    # only the stubbed-vs-real torchaudio mel buffer names may differ
    assert all("mel_transfm" in k for k in list(missing) + list(unexpected)), (
        missing, unexpected)
    np.testing.assert_array_equal(model.module.clip_code_mu.numpy(),
                                  np.asarray(state["clip_code_mu"]))

    # and the import path round-trips it
    back = ti.import_pose2pose(pth, state)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), state, back)
