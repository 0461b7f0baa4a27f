"""Time-axis sequence parallelism: shard-vs-dense exactness.

The sequence-parallel generator (parallel/seqparallel.py) must reproduce the
dense SequenceGeneratorCNN forward bit-comparably at any length — halo-exchanged
convs, per-shard banded resize matrices, and psum'd InstanceNorm-2d statistics
together constitute an EXACT split of the computation, unlike the windowed
crossfade demo mode (which approximates per-window IN stats)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechdrivestemplates_tpu.parallel import mesh as mesh_lib
from speechdrivestemplates_tpu.parallel.seqparallel import (
    generator_seq_parallel, make_sharded_resize)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest forces 8 virtual CPU devices"
    return mesh_lib.get_data_mesh(8)


def test_sharded_resize_matrices_cover_global():
    """Stacked per-shard banded matrices reassemble the global matrix."""
    from speechdrivestemplates_tpu.ops.resize import _resize_matrix

    for in_len, out_len, n, valid in [(64, 128, 8, None), (400, 512, 8, 398),
                                      (96, 48, 8, None), (80, 80, 8, None)]:
        mats, halo = make_sharded_resize(in_len, out_len, n, valid_src=valid)
        mats = np.asarray(mats)
        W = _resize_matrix(valid or in_len, out_len)
        if valid:
            W = np.concatenate(
                [W, np.zeros((out_len, in_len - valid), np.float32)], 1)
        in_l, out_l = in_len // n, out_len // n
        rebuilt = np.zeros_like(W)
        for s in range(n):
            lo = s * in_l - halo
            for j in range(mats.shape[2]):
                g = lo + j
                if 0 <= g < in_len:
                    rebuilt[s * out_l:(s + 1) * out_l, g] += mats[s, :, j]
        np.testing.assert_allclose(rebuilt, W, atol=1e-7)


@pytest.mark.slow
@pytest.mark.parametrize("with_code", [True, False])
def test_seq_parallel_matches_dense(mesh8, with_code):
    """8-way time-sharded forward == dense forward (fp32, ~1e-4)."""
    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.models import build_model

    cfg = get_cfg_defaults()
    cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION = 32 if with_code else None
    cfg.freeze()
    gen = build_model("SequenceGeneratorCNN", cfg)

    T, t_mel = 512, 3200  # % (32*8), % (8*8)
    rng = np.random.RandomState(0)
    mel = (rng.randn(1, 80, t_mel) * 2).astype(np.float32)
    code = rng.randn(1, 32).astype(np.float32) if with_code else None

    variables = gen.init(jax.random.PRNGKey(0), jnp.asarray(mel), T,
                         None if code is None else jnp.asarray(code), False)
    dense = np.asarray(gen.apply(variables, jnp.asarray(mel), T,
                                 None if code is None else jnp.asarray(code),
                                 False))

    sharded = np.asarray(generator_seq_parallel(
        mesh8, variables["params"], mel, T, code,
        leaky=cfg.VOICE2POSE.GENERATOR.LEAKY_RELU))

    assert sharded.shape == dense.shape == (1, T, 2, 121)
    np.testing.assert_allclose(sharded, dense, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_seq_parallel_demo_pipeline(mesh8, tmp_path):
    """DEMO.SEQUENCE_PARALLEL end to end through the Voice2Pose demo path on
    the 8-device mesh: long wav -> sharded exact forward -> denormalized
    poses.  The early frames must agree with the dense eval forward (the tail
    differs only by the silence-pad's receptive-field bleed)."""
    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import (make_demo_wav,
                                                              make_synthetic_speaker)
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    import os

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=0)
    wav = make_demo_wav(str(tmp_path / "long.wav"), seconds=34.2)  # ~512 frames

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.DATASET.MAX_DEMO_LENGTH = None
    cfg.DEMO.CODE_INDEX = 1
    cfg.SYS.MESH.DATA = 8
    cfg.freeze()

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    from speechdrivestemplates_tpu.parallel import mesh as mesh_lib

    pipe.mesh = mesh_lib.get_data_mesh(8)
    pipe.num_train_samples = 4
    pipe.setup_dataset(cfg, "demo", demo_input=wav)
    pipe.setup_model(cfg)
    batch_s = next(iter(pipe.test_dataloader))
    from speechdrivestemplates_tpu.datasets.gesture_dataset import _collate

    batch = batch_s if isinstance(batch_s, dict) else _collate([batch_s])
    num_frames = int(np.asarray(batch["num_frames"]).reshape(-1)[0])
    assert num_frames >= 384

    seq = pipe._seq_parallel_demo_forward(batch, num_frames, None)
    pred_seq = seq["poses_pred_batch"]
    assert pred_seq.shape == (1, num_frames, 2, 121)
    assert np.isfinite(pred_seq).all()

    # dense reference = the defined semantics: dense forward on the SAME
    # silence-padded audio at T_pad, trimmed (single device; batch 1)
    from speechdrivestemplates_tpu.ops.mel import mel_spectrogram

    n = 8
    t_pad = -(-num_frames // (32 * n)) * (32 * n)
    audio = np.asarray(batch["audio"][0], np.float32)
    t_mel_target = -(-(len(audio) // 160 + 2) // (8 * n)) * (8 * n)
    audio_pad = np.zeros(((t_mel_target - 1) * 160,), np.float32)
    audio_pad[: len(audio)] = audio
    mel = mel_spectrogram(jnp.asarray(audio_pad[None]), impl=cfg.SYS.MEL_IMPL)
    code = jnp.broadcast_to(pipe.state["clips_code"][1][None], (1, 32))
    pred = pipe.generator.apply({"params": pipe.state["params_g"]}, mel,
                                t_pad, code, False)[:, :num_frames]
    pred_dense = np.asarray(pipe._final_results(batch, pred))
    np.testing.assert_allclose(pred_seq, pred_dense, rtol=2e-4, atol=0.05)


@pytest.mark.slow
def test_seq_parallel_matches_dense_bn(mesh8):
    """s2g-style generator (NORM='BN', no clip code): the seq-parallel forward
    must match the dense eval forward — BN-eval is a local running-stat affine
    per shard."""
    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.models import build_model

    cfg = get_cfg_defaults()
    cfg.VOICE2POSE.GENERATOR.NORM = "BN"
    cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION = None
    cfg.freeze()
    gen = build_model("SequenceGeneratorCNN", cfg)

    T, t_mel = 256, 1600
    rng = np.random.RandomState(1)
    mel = (rng.randn(1, 80, t_mel) * 2).astype(np.float32)
    variables = gen.init(jax.random.PRNGKey(0), jnp.asarray(mel), T, None, True)
    # randomize the running stats so BN-eval is a real test
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    dense = np.asarray(gen.apply(variables, jnp.asarray(mel), T, None, False))
    sharded = np.asarray(generator_seq_parallel(
        mesh8, variables["params"], mel, T, None,
        leaky=cfg.VOICE2POSE.GENERATOR.LEAKY_RELU, norm="BN",
        batch_stats=variables["batch_stats"]))
    np.testing.assert_allclose(sharded, dense, rtol=2e-4, atol=2e-4)


def test_short_clip_raises_clear_error():
    """A clip far shorter than the mesh is wide cannot satisfy the adjacent-
    shard halo exchange; make_sharded_resize must fail with an actionable
    error instead of a cryptic slice crash (and the demo path falls back to
    the dense forward — see test_end_to_end/demo coverage)."""
    from speechdrivestemplates_tpu.parallel.seqparallel import \
        make_sharded_resize

    with pytest.raises(ValueError, match="too short"):
        # 1 s of audio on an 8-way mesh: t_mel-ish 128 -> 256 frames
        make_sharded_resize(16, 256, 8, valid_src=2)


def test_unknown_norm_raises(mesh8):
    from speechdrivestemplates_tpu.parallel.seqparallel import \
        generator_seq_parallel

    with pytest.raises(ValueError, match="unknown norm"):
        generator_seq_parallel(mesh8, {}, np.zeros((1, 80, 64 * 8),
                                                     np.float32),
                               32 * 8, None, norm="bn")


@pytest.mark.slow
def test_short_clip_demo_pads_and_runs(mesh8, tmp_path, monkeypatch):
    """A 1.1 s demo clip: shorter than one training window, which underflows
    the UNet in BOTH frameworks — the demo loader zero-pads it to NUM_FRAMES,
    and demo_step completes under DEMO.SEQUENCE_PARALLEL on the 8-way mesh.
    Also exercises the ValueError->dense fallback branch via monkeypatch."""
    import os

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.gesture_dataset import _collate
    from speechdrivestemplates_tpu.datasets.synthetic import (
        make_demo_wav, make_synthetic_speaker)
    from speechdrivestemplates_tpu.parallel import mesh as mesh_lib
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=0)
    wav = make_demo_wav(str(tmp_path / "short.wav"), seconds=1.1)

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.DATASET.MAX_DEMO_LENGTH = None
    cfg.DEMO.SEQUENCE_PARALLEL = True
    cfg.DEMO.CODE_INDEX = 1
    cfg.SYS.MESH.DATA = 8
    cfg.TEST.SAVE_NPZ = True
    cfg.TEST.SAVE_VIDEO = False
    cfg.freeze()

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.mesh = mesh_lib.get_data_mesh(8)
    pipe.num_train_samples = 4
    pipe.setup_dataset(cfg, "demo", demo_input=wav)
    pipe.setup_model(cfg)
    pipe.base_path = str(tmp_path / "out")
    os.makedirs(os.path.join(pipe.base_path, "results"), exist_ok=True)

    batch_s = next(iter(pipe.test_dataloader))
    batch = batch_s if isinstance(batch_s, dict) else _collate([batch_s])
    num_frames = int(np.asarray(batch["num_frames"]).reshape(-1)[0])
    assert num_frames == cfg.DATASET.NUM_FRAMES  # loader padded to one window

    pipe.demo_step(batch, t_step=1)
    import glob

    npzs = glob.glob(os.path.join(pipe.base_path, "results", "*.npz"))
    assert npzs
    poses = np.load(npzs[0])["poses_pred_batch"]
    assert poses.shape[1] == cfg.DATASET.NUM_FRAMES

    # the too-short-for-the-mesh guard: force the ValueError path and assert
    # the dense fallback completes (covers ultra-wide meshes)
    def boom(*a, **k):
        raise ValueError("forced: clip too short for this mesh")

    monkeypatch.setattr(pipe, "_seq_parallel_demo_forward", boom)
    pipe.demo_step(batch, t_step=2)
    assert len(glob.glob(os.path.join(pipe.base_path, "results",
                                      "*.npz"))) >= 2
