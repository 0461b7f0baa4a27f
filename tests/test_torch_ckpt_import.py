"""End-to-end .pth import: a reference-style checkpoint (module.-prefixed state dict
with netG/clips_code) mapped onto the pipeline state via utils.torch_import."""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")


@pytest.mark.slow
def test_import_voice2pose_checkpoint(tmp_path):
    import torch

    sys.path.insert(0, REFERENCE)
    from core.networks.keypoints_generation.generator import \
        SequenceGeneratorCNN as TorchGen

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline
    from speechdrivestemplates_tpu.utils.torch_import import import_voice2pose

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=2)

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", "configs",
                                     "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.SYS.MESH.DATA = 1
    cfg.freeze()

    # fabricate a reference-style checkpoint (DataParallel module. prefixes)
    torch.manual_seed(0)
    tgen = TorchGen(cfg)
    sd = {f"module.netG.{k}": v for k, v in tgen.state_dict().items()}
    sd["module.clips_code"] = torch.randn(4, 32)
    ckpt_path = str(tmp_path / "ref.pth")
    torch.save({"model_state_dict": sd, "epoch": 7, "step": 70}, ckpt_path)

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    new_state = import_voice2pose(ckpt_path, pipe.state)

    np.testing.assert_allclose(np.asarray(new_state["clips_code"]),
                               sd["module.clips_code"].numpy(), atol=1e-6)
    # a conv kernel landed transposed into channels-last layout
    tw = sd["module.netG.decoder.4.weight"].numpy()  # (242, 256, 1)
    ours = np.asarray(new_state["params_g"]["decoder_out"]["kernel"])  # (1, 256, 242)
    np.testing.assert_allclose(ours, np.transpose(tw, (2, 1, 0)), atol=1e-6)


@pytest.mark.slow
def test_import_pose2pose_checkpoint(tmp_path):
    import torch

    sys.path.insert(0, REFERENCE)
    from core.networks.poses_reconstruction.autoencoder import \
        Autoencoder as TorchAE

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline
    from speechdrivestemplates_tpu.utils.torch_import import import_pose2pose

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=2)

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", "configs",
                                     "pose2pose.yaml"))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.SYS.MESH.DATA = 1
    cfg.freeze()

    torch.manual_seed(0)
    tae = TorchAE(cfg)
    sd = {f"module.ae.{k}": v for k, v in tae.state_dict().items()}
    sd["module.clip_code_mu"] = torch.randn(4, 32)
    sd["module.clip_code_logvar"] = torch.randn(4, 32)
    ckpt_path = str(tmp_path / "ref_p2p.pth")
    torch.save({"model_state_dict": sd}, ckpt_path)

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    new_state = import_pose2pose(ckpt_path, pipe.state)

    np.testing.assert_allclose(np.asarray(new_state["clip_code_mu"]),
                               sd["module.clip_code_mu"].numpy(), atol=1e-6)
    tw = sd["module.ae.decoder.blocks.4.weight"].numpy()  # (242, 256, 1)
    ours = np.asarray(new_state["params_ae"]["decoder"]["out"]["kernel"])
    np.testing.assert_allclose(ours, np.transpose(tw, (2, 1, 0)), atol=1e-6)
    # BN running stats landed in batch_stats
    bs = new_state["batch_stats_ae"]["encoder"]["ConvNormRelu_0"]["norm"]
    tm = sd["module.ae.encoder.blocks.0.norm.running_mean"].numpy()
    np.testing.assert_allclose(np.asarray(bs["mean"]), tm, atol=1e-6)


@pytest.mark.slow
def test_ae_checkpoint_and_cli_paths_accept_pth(tmp_path):
    """The config/CLI surfaces that take checkpoints accept a reference .pth
    directly: VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT (frozen FGD encoder +
    external code bank from a trained reference Pose2Pose), --checkpoint via
    load_torch_pth, and --resume_from rejects it with guidance."""
    import torch

    sys.path.insert(0, REFERENCE)
    from core.networks.poses_reconstruction.autoencoder import \
        Autoencoder as TorchAE

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=2)
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")

    # fabricate a reference-style Pose2Pose checkpoint (.pth)
    p2p = get_cfg_defaults()
    p2p.merge_from_file(os.path.join(cfg_dir, "pose2pose.yaml"))
    p2p.DATASET.ROOT_DIR = root
    p2p.DATASET.SPEAKER = "oliver"
    p2p.freeze()
    torch.manual_seed(0)
    tae = TorchAE(p2p)
    sd = {f"module.ae.{k}": v for k, v in tae.state_dict().items()}
    sd["module.clip_code_mu"] = torch.randn(4, 32)
    sd["module.clip_code_logvar"] = torch.randn(4, 32)
    pth = str(tmp_path / "ref_p2p.pth")
    torch.save({"model_state_dict": sd}, pth)

    # SDT-VAE setup_model with AE_CHECKPOINT=<.pth>: frozen encoder weights and
    # the external template bank must come from the torch file
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(cfg_dir, "voice2pose_sdt_vae.yaml"))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.SYS.MESH.DATA = 1
    cfg.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT = pth
    cfg.freeze()
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)

    np.testing.assert_allclose(np.asarray(pipe.state["clips_code"]),
                               sd["module.clip_code_mu"].numpy(), atol=1e-6)
    tw = sd["module.ae.encoder.blocks.0.conv.weight"].numpy()
    ours = np.asarray(
        pipe.state["params_pe"]["ConvNormRelu_0"]["conv"]["kernel"])
    np.testing.assert_allclose(ours, np.transpose(tw, (2, 1, 0)), atol=1e-6)
    tm = sd["module.ae.encoder.blocks.0.norm.running_mean"].numpy()
    np.testing.assert_allclose(
        np.asarray(pipe.state["batch_stats_pe"]["ConvNormRelu_0"]["norm"]["mean"]),
        tm, atol=1e-6)

    # --resume_from <.pth> is rejected with guidance toward --pretrain_from
    with pytest.raises(ValueError, match="pretrain_from"):
        pipe.setup_experiment(True, "x", resume_from=pth)


@pytest.mark.slow
def test_pth_guards_and_export_surface(tmp_path):
    """The failure modes of .pth migration refuse loudly instead of corrupting
    silently: bank-size mismatch (jit gathers clamp!), partial encoder fill,
    untranslatable keys, --export_torch of an already-torch file; and
    --export produces a serving artifact straight from a .pth."""
    import torch

    sys.path.insert(0, REFERENCE)
    from core.networks.keypoints_generation.generator import \
        SequenceGeneratorCNN as TorchGen
    from core.networks.poses_reconstruction.autoencoder import \
        Autoencoder as TorchAE

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=2)
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(cfg_dir, "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.SYS.MESH.DATA = 1
    cfg.freeze()

    torch.manual_seed(0)
    tgen = TorchGen(cfg)
    sd = {f"module.netG.{k}": v for k, v in tgen.state_dict().items()}
    sd["module.clips_code"] = torch.randn(3, 32)  # train split has 4 clips
    bad_bank = str(tmp_path / "bank3.pth")
    torch.save({"model_state_dict": sd}, bad_bank)

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    with pytest.raises(ValueError, match="4 clips"):
        pipe.load_torch_pth(bad_bank)

    # good bank: loads, and --export accepts the .pth directly
    sd["module.clips_code"] = torch.randn(4, 32)
    good = str(tmp_path / "bank4.pth")
    torch.save({"model_state_dict": sd}, good)
    pipe.load_torch_pth(good)

    from speechdrivestemplates_tpu.utils.export import export_serving_fn

    artifact = str(tmp_path / "artifact")
    meta = export_serving_fn(cfg, good, artifact, platforms=("cpu",))
    assert os.path.exists(artifact) and meta["bytes"] > 0

    # --export_torch of an already-torch checkpoint is refused with guidance
    from speechdrivestemplates_tpu.utils.torch_export import export_checkpoint

    with pytest.raises(ValueError, match="already a PyTorch"):
        export_checkpoint(cfg, good, str(tmp_path / "out.pth"))

    # frozen-encoder loads refuse partial fills and untranslatable keys
    p2p = get_cfg_defaults()
    p2p.merge_from_file(os.path.join(cfg_dir, "pose2pose.yaml"))
    p2p.DATASET.ROOT_DIR = root
    p2p.DATASET.SPEAKER = "oliver"
    p2p.freeze()
    tae = TorchAE(p2p)
    ae_sd = {f"module.ae.{k}": v for k, v in tae.state_dict().items()}

    vae = get_cfg_defaults()
    vae.merge_from_file(os.path.join(cfg_dir, "voice2pose_sdt_vae.yaml"))
    vae.DATASET.ROOT_DIR = root
    vae.DATASET.SPEAKER = "oliver"
    vae.SYS.MESH.DATA = 1
    missing = dict(ae_sd)
    missing.pop("module.ae.encoder.blocks.0.conv.weight")
    missing["module.clip_code_mu"] = torch.randn(4, 32)
    miss_pth = str(tmp_path / "missing.pth")
    torch.save({"model_state_dict": missing}, miss_pth)
    vae.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT = miss_pth
    vae.freeze()
    vpipe = get_pipeline(vae.PIPELINE_TYPE)(vae)
    vpipe.setup_dataset(vae, "train")
    with pytest.raises(ValueError, match="34 of 35"):
        vpipe.setup_model(vae)

    bogus = dict(ae_sd)
    bogus["module.ae.encoder.extra.conv.weight"] = torch.randn(64, 64, 3)
    bogus["module.clip_code_mu"] = torch.randn(4, 32)
    bogus_pth = str(tmp_path / "bogus.pth")
    torch.save({"model_state_dict": bogus}, bogus_pth)
    vae2 = vae.clone()
    vae2.defrost()
    vae2.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT = bogus_pth
    vae2.freeze()
    vpipe2 = get_pipeline(vae2.PIPELINE_TYPE)(vae2)
    vpipe2.setup_dataset(vae2, "train")
    with pytest.raises(ValueError, match="no translation"):
        vpipe2.setup_model(vae2)
