"""CLI smoke test: the real ``python main.py`` surface (reference README workflows),
train -> test -> demo through subprocesses on the synthetic fixture."""

import glob
import os
import subprocess
import sys

import pytest

from speechdrivestemplates_tpu.datasets.synthetic import (make_demo_wav,
                                                          make_synthetic_speaker)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # drop the TPU-registering sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # share the persistent compile cache with the test process (conftest)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/sdt_jax_tests"))
    return env


def _run(args, env=None):
    return subprocess.run([sys.executable, "main.py"] + args, cwd=REPO,
                          env=env or _env(),
                          capture_output=True, text=True, timeout=1200)


@pytest.mark.slow
def test_cli_train_test_demo(tmp_path):
    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=2)
    out = str(tmp_path / "out")
    wav = make_demo_wav(str(tmp_path / "demo.wav"))

    common = [
        "DATASET.ROOT_DIR", root, "DATASET.SPEAKER", "oliver",
        "TRAIN.NUM_EPOCHS", "1", "TRAIN.BATCH_SIZE", "2", "TEST.BATCH_SIZE", "2",
        "TRAIN.SAVE_VIDEO", "False", "TEST.SAVE_VIDEO", "False",
        "TRAIN.VALIDATE", "False", "SYS.OUTPUT_DIR", out, "SYS.MESH.DATA", "1",
        "SYS.NUM_WORKERS", "0",
    ]

    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml", "--tag", "cli"]
             + common)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpts = glob.glob(os.path.join(out, "*TRAIN*", "checkpoints", "checkpoint_*"))
    assert ckpts, r.stdout[-2000:]

    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml", "--tag", "cli",
              "--test_only", "--checkpoint", ckpts[0]] + common)
    assert r.returncode == 0, r.stderr[-2000:]

    # the demo leg runs in the REAL environment (TPU-registering sitecustomize
    # intact, no JAX_PLATFORMS sanitizing) with only the SYS.PLATFORM pin —
    # the exact configuration that keeps the CLI usable through a wedged
    # device tunnel (see config.py SYS.PLATFORM)
    env_real = dict(os.environ)
    env_real.setdefault("JAX_COMPILATION_CACHE_DIR",
                        os.path.expanduser("~/.cache/sdt_jax_tests"))
    env_real.pop("JAX_PLATFORMS", None)
    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml", "--tag", "cli",
              "--demo_input", wav, "--checkpoint", ckpts[0]] + common
             + ["SYS.VIDEO_FORMAT", "['img']", "SYS.PLATFORM", "cpu"],
             env=env_real)
    assert r.returncode == 0, r.stderr[-2000:]
    demo_npz = glob.glob(os.path.join(out, "*DEMO*", "results", "*.npz"))
    assert demo_npz


def test_cli_export_torch(tmp_path):
    """--export_torch converts a trained orbax checkpoint to a reference .pth
    through the CLI (subprocess, CPU)."""
    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=0)
    out = str(tmp_path / "out")

    common = [
        "DATASET.ROOT_DIR", root, "DATASET.SPEAKER", "oliver",
        "TRAIN.NUM_EPOCHS", "1", "TRAIN.BATCH_SIZE", "2",
        "TRAIN.SAVE_VIDEO", "False", "TRAIN.VALIDATE", "False",
        "SYS.OUTPUT_DIR", out, "SYS.MESH.DATA", "1", "SYS.NUM_WORKERS", "0",
    ]
    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml", "--tag", "xt"]
             + common)
    assert r.returncode == 0, r.stderr[-2000:]
    exp = glob.glob(os.path.join(out, "*TRAIN*"))[0]

    pth = os.path.join(out, "sdt_bp.pth")
    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml",
              "--checkpoint", exp, "--export_torch", pth] + common)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "exported" in r.stdout and os.path.exists(pth)

    import torch

    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"]
    # keys must carry the DataParallel prefix: the reference wraps before
    # load_state_dict and indexes state_dict['module.clips_code'] directly
    assert any(k.startswith("module.netG.") for k in sd)
    assert "module.clips_code" in sd and sd["module.clips_code"].shape == (4, 32)
    assert ckpt["epoch"] == 1


def test_cli_preemption_checkpoint_and_auto_resume(tmp_path):
    """SIGTERM mid-training -> step-boundary checkpoint + exit 143; a restart
    with TRAIN.AUTO_RESUME picks it up (the preemptible-job story end to end)."""
    import signal
    import subprocess

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=8, num_dev=0)
    out = str(tmp_path / "out")

    common = [
        "DATASET.ROOT_DIR", root, "DATASET.SPEAKER", "oliver",
        "TRAIN.NUM_EPOCHS", "500", "TRAIN.BATCH_SIZE", "2",
        "TRAIN.SAVE_VIDEO", "False", "TRAIN.VALIDATE", "False",
        "TRAIN.AUTO_RESUME", "True", "TRAIN.CHECKPOINT_INTERVAL", "1000",
        "SYS.OUTPUT_DIR", out, "SYS.MESH.DATA", "1", "SYS.NUM_WORKERS", "0",
        "SYS.LOG_INTERVAL", "1",
    ]
    proc = subprocess.Popen(
        [sys.executable, "main.py", "--config_file",
         "configs/voice2pose_sdt_bp.yaml", "--tag", "pre"] + common,
        cwd=REPO, env=_env(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)

    # wait until at least one optimization step has logged, then preempt.
    # readline blocks, so the deadline is enforced by a kill timer (a wedged
    # subprocess must fail the test, not hang the suite).
    import threading

    killer = threading.Timer(600, proc.kill)
    killer.daemon = True
    killer.start()
    saw_step = False
    lines = []
    try:
        for line in proc.stdout:
            lines.append(line)
            if "global_step" in line:
                saw_step = True
                break
    finally:
        killer.cancel()  # the SIGTERM phase below has its own timeout
    assert saw_step, "".join(lines)[-3000:]
    proc.send_signal(signal.SIGTERM)
    rest, _ = proc.communicate(timeout=300)
    assert proc.returncode == 143, (proc.returncode, rest[-3000:])
    assert "Preemption checkpoint saved" in rest

    ckpts = glob.glob(os.path.join(out, "*TRAIN*", "checkpoints",
                                   "checkpoint_*"))
    assert ckpts, rest[-2000:]

    # restart the SAME command: AUTO_RESUME must find the preemption save
    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml", "--tag",
              "pre", "--test_only", "--checkpoint", ckpts[0]] + common)
    # (test_only with the explicit checkpoint proves the save restores; the
    # auto-resume resolution itself:)
    assert r.returncode == 0, r.stderr[-2000:]
    from speechdrivestemplates_tpu.pipelines.trainer import Trainer

    found = Trainer.find_auto_resume(out, "voice2pose_sdt_bp-TRAIN-pre")
    assert found is not None and os.path.basename(ckpts[0]) == os.path.basename(found)


@pytest.mark.slow
def test_cli_eval_from_pth_matches_orbax(tmp_path):
    """A reference-format .pth passed straight to --checkpoint (the migration
    path for the reference's published checkpoints) evaluates to EXACTLY the
    metrics of the orbax checkpoint it was exported from; --pretrain_from
    accepts it; --resume_from rejects it with guidance."""
    import re

    root = str(tmp_path / "speakers")
    make_synthetic_speaker(root, "oliver", num_train=4, num_dev=2)
    out = str(tmp_path / "out")

    common = [
        "DATASET.ROOT_DIR", root, "DATASET.SPEAKER", "oliver",
        "TRAIN.NUM_EPOCHS", "1", "TRAIN.BATCH_SIZE", "2", "TEST.BATCH_SIZE", "2",
        "TRAIN.SAVE_VIDEO", "False", "TEST.SAVE_VIDEO", "False",
        "TRAIN.VALIDATE", "False", "SYS.OUTPUT_DIR", out, "SYS.MESH.DATA", "1",
        "SYS.NUM_WORKERS", "0",
    ]
    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml", "--tag", "pp"]
             + common)
    assert r.returncode == 0, r.stderr[-2000:]
    exp = glob.glob(os.path.join(out, "*TRAIN*"))[0]
    pth = os.path.join(out, "sdt_bp.pth")
    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml",
              "--checkpoint", exp, "--export_torch", pth] + common)
    assert r.returncode == 0, r.stderr[-2000:]

    def metrics_of(checkpoint):
        r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml", "--tag",
                  "pp", "--test_only", "--checkpoint", checkpoint] + common)
        assert r.returncode == 0, r.stderr[-2000:]
        m = re.search(r"\[TEST\].*L2_dist: ([\d.]+).*FGD_mu: ([\d.]+)",
                      r.stdout + r.stderr)
        assert m, (r.stdout + r.stderr)[-3000:]
        return float(m.group(1)), float(m.group(2))

    assert metrics_of(exp) == metrics_of(pth)

    # --pretrain_from <.pth> trains from the imported weights
    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml", "--tag", "pt",
              "--pretrain_from", pth] + common)
    assert r.returncode == 0, r.stderr[-2000:]

    # --resume_from <.pth> is rejected with guidance
    r = _run(["--config_file", "configs/voice2pose_sdt_bp.yaml", "--tag", "pp",
              "--resume_from", pth] + common)
    assert r.returncode != 0 and "pretrain_from" in (r.stdout + r.stderr)
