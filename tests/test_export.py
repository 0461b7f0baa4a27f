"""AOT serving export (utils/export.py): artifact round-trip equivalence.

Exports the wav->pose serving function from a saved checkpoint, deserializes
the StableHLO artifact, and checks the result matches the live pipeline's
forward to round-off (same weights, same input, same platform).
"""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
from speechdrivestemplates_tpu.pipelines import get_pipeline
from speechdrivestemplates_tpu.utils.export import (
    build_serving_fn, export_serving_fn, load_serving_fn)

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _mk_cfg(tmp):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(CFG_DIR, "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = tmp
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.SYS.NUM_WORKERS = 0
    cfg.freeze()
    return cfg


@pytest.mark.slow
def test_export_round_trip(rng):
    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_speaker(tmp, "oliver", num_train=4, num_dev=0)
        cfg = _mk_cfg(tmp)
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        pipe.base_path = tmp
        pipe.save_checkpoint(epoch=1, global_step=1)

        out_path = os.path.join(tmp, "serving", "sdt_bp.stablehlo")
        meta = export_serving_fn(cfg, os.path.join(tmp, "checkpoints"),
                                 out_path, batch_size=2)
        assert os.path.exists(out_path) and meta["bytes"] > 0
        with open(out_path + ".json") as f:
            side = json.load(f)
        assert side["code_dim"] == 32 and side["batch_size"] == 2
        assert side["audio_length"] == cfg.DATASET.AUDIO_LENGTH
        # the default export is portable: lowered for BOTH cpu and tpu, so an
        # artifact exported on the TPU trainer runs on a CPU serving box
        assert set(side["platforms"]) >= {"cpu", "tpu"}

        audio = jnp.asarray(
            rng.randn(2, cfg.DATASET.AUDIO_LENGTH).astype(np.float32) * 0.1)
        code = jnp.asarray(rng.randn(2, 32).astype(np.float32))

        served = load_serving_fn(out_path)
        got = np.asarray(served(audio, code))

        fn, has_code = build_serving_fn(
            cfg, jax.device_get(pipe.state["params_g"]),
            jax.device_get(pipe.state.get("batch_stats_g") or {}))
        assert has_code
        want = np.asarray(fn(audio, code))
        assert got.shape == want.shape == (2, cfg.DATASET.NUM_FRAMES, 2,
                                           cfg.DATASET.NUM_LANDMARKS)
        # deserialized StableHLO recompiles through its own fusion pipeline, so
        # exact bit-equality is not guaranteed — only round-off level drift
        # (measured 3e-4 absolute on O(100 px) outputs)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)
        # pixel-space sanity: denormalization took the poses out of z-scores
        assert float(np.abs(got).max()) > 10.0


@pytest.mark.slow
def test_export_round_trip_s2g_bn(rng):
    """BN generator (s2g) + no clip code: exercises batch-stats baking and the
    single-input (audio-only) serving signature."""
    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_speaker(tmp, "oliver", num_train=4, num_dev=0)
        cfg = get_cfg_defaults()
        cfg.merge_from_file(os.path.join(CFG_DIR, "voice2pose_s2g.yaml"))
        cfg.DATASET.ROOT_DIR = tmp
        cfg.DATASET.SPEAKER = "oliver"
        cfg.TRAIN.BATCH_SIZE = 4
        cfg.SYS.NUM_WORKERS = 0
        cfg.freeze()
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        pipe.base_path = tmp
        pipe.save_checkpoint(epoch=1, global_step=1)

        out_path = os.path.join(tmp, "serving", "s2g.stablehlo")
        meta = export_serving_fn(cfg, os.path.join(tmp, "checkpoints"),
                                 out_path, batch_size=2)
        assert meta["code_dim"] is None
        assert meta["inputs"] == ["audio f32[B,L]"]

        audio = jnp.asarray(
            rng.randn(2, cfg.DATASET.AUDIO_LENGTH).astype(np.float32) * 0.1)
        served = load_serving_fn(out_path)
        got = np.asarray(served(audio))

        fn, has_code = build_serving_fn(
            cfg, jax.device_get(pipe.state["params_g"]),
            jax.device_get(pipe.state.get("batch_stats_g") or {}))
        assert not has_code
        want = np.asarray(fn(audio))
        # s2g outputs are O(1000 px) (non-hierarchical global space), so the
        # StableHLO-recompile round-off scales up accordingly
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-2)


@pytest.mark.slow
def test_standalone_serving_runner(rng, tmp_path):
    """serving/run_artifact.py consumes an artifact with zero framework
    imports (subprocess; the script itself never imports the package)."""
    import subprocess
    import sys

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_speaker(tmp, "oliver", num_train=4, num_dev=0)
        cfg = _mk_cfg(tmp)
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        pipe.base_path = tmp
        pipe.save_checkpoint(epoch=1, global_step=1)
        art = os.path.join(tmp, "m.stablehlo")
        export_serving_fn(cfg, os.path.join(tmp, "checkpoints"), art)

        from speechdrivestemplates_tpu.datasets.synthetic import make_demo_wav

        wav = make_demo_wav(str(tmp_path / "in.wav"))
        out = str(tmp_path / "out.npz")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # pin the runner to CPU: without it the subprocess inherits the axon
        # env and hangs forever on device enumeration when the TPU tunnel is
        # wedged (observed in production) — also exercises --platform
        env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "serving", "run_artifact.py"),
             art, wav, out, "--platform", "cpu"],
            capture_output=True, text=True, timeout=1800, env=env)  # CPU
        # compile of the artifact takes minutes under full-suite contention
        assert r.returncode == 0, r.stderr[-2000:]
        d = np.load(out)
        assert d["poses"].shape == (cfg.DATASET.NUM_FRAMES, 2,
                                    cfg.DATASET.NUM_LANDMARKS)
        assert np.isfinite(d["poses"]).all()
