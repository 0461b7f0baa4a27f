"""Small odds and ends: mel impl dispatch, TPU-era config keys, audio helpers."""

import numpy as np
import pytest


def test_mel_auto_dispatch_cpu(rng):
    """'auto' must resolve to the dft path on CPU (pallas needs a TPU)."""
    import jax.numpy as jnp

    from speechdrivestemplates_tpu.ops.mel import mel_spectrogram

    audio = rng.randn(1, 8000).astype(np.float32)
    a = np.asarray(mel_spectrogram(jnp.asarray(audio), impl="auto"))
    b = np.asarray(mel_spectrogram(jnp.asarray(audio), impl="dft"))
    np.testing.assert_array_equal(a, b)


def test_tpu_config_keys():
    from speechdrivestemplates_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    assert cfg.SYS.MESH.DATA == -1
    assert cfg.SYS.MEL_IMPL == "auto"
    assert cfg.SYS.PROFILE.ENABLED is False
    assert cfg.TRAIN.PRECISION == "fp32"
    assert cfg.SYS.DEBUG_NANS is False
    # overridable from the CLI like any yacs key
    cfg.merge_from_list(["SYS.MEL_IMPL", "pallas", "TRAIN.PRECISION", "bf16"])
    assert cfg.SYS.MEL_IMPL == "pallas"


def test_parse_audio_length_table():
    from speechdrivestemplates_tpu.utils.audio import parse_audio_length

    # reference-documented values (float division quirks included: 16000/1066.6*
    # floors to 14 frames, exactly as the reference computes)
    assert parse_audio_length(68267, 16000, 15) == (68266, 64)
    assert parse_audio_length(16000, 16000, 15) == (14933, 14)
    # short audio still snaps down
    assert parse_audio_length(1100, 16000, 15) == (1066, 1)


def test_crop_pad_audio(rng):
    from speechdrivestemplates_tpu.utils.audio import crop_pad_audio

    w = rng.randn(100).astype(np.float32)
    assert crop_pad_audio(w, 50).shape == (50,)
    out = crop_pad_audio(w, 150)
    assert out.shape == (150,)
    assert (out[100:] == 0).all()


def test_wav_roundtrip(tmp_path, rng):
    from scipy.io import wavfile

    from speechdrivestemplates_tpu.utils.audio import load_wav

    sig = (rng.randn(16000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wavfile.write(p, 16000, (sig * 32767).astype(np.int16))
    out = load_wav(p, 16000)
    np.testing.assert_allclose(out, sig, atol=1e-3)

    # stereo + resample path
    stereo = np.stack([sig, sig], 1)
    p2 = str(tmp_path / "t2.wav")
    wavfile.write(p2, 32000, (stereo * 32767).astype(np.int16))
    out2 = load_wav(p2, 16000)
    assert out2.ndim == 1 and abs(len(out2) - 8000) < 10


def test_fgd_sanity(rng):
    from speechdrivestemplates_tpu.ops.fgd import compute_fgd

    a = rng.randn(200, 16)
    b = rng.randn(200, 16) + 3.0
    same = compute_fgd(a, a.copy())
    far = compute_fgd(a, b)
    assert same < 1e-6
    assert far > 100  # ~16 * 9


def test_bench_e2e_stagelog_survives_restart(tmp_path):
    """Stage records persist to stages.jsonl and merge across orchestrator
    invocations (latest record per stage wins) — outage recovery for the
    production run: a mid-run death costs a re-launch of the remaining
    --stages digits, not the completed stages' evidence."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench_e2e import StageLog

    path = str(tmp_path / "stages.jsonl")
    first = StageLog(path)
    first.append({"stage": "pose2pose-100ep", "wall_s": 685.5, "ok": True})
    first.append({"stage": "sdt_bp-100ep", "wall_s": 1740.0, "ok": False})

    # the kill also tore the final line mid-write (no newline, half a record)
    with open(path, "a") as f:
        f.write('{"stage": "sdt_vae-100ep", "wall')

    # the orchestrator dies; a new invocation re-runs only the failed stage
    second = StageLog(path)
    second.append({"stage": "sdt_bp-100ep", "wall_s": 920.0, "ok": True,
                   "resumed_from_epoch": 80})
    merged = second.merged()
    # torn line skipped; the append after it was newline-repaired, not eaten
    assert [r["stage"] for r in merged] == ["pose2pose-100ep", "sdt_bp-100ep"]
    assert merged[0]["wall_s"] == 685.5          # survived the death
    assert merged[1]["ok"] and merged[1]["wall_s"] == 920.0  # latest wins
    # the failed first attempt's 1740 s is real cost: accumulated, not lost
    assert merged[1]["wall_s_all_attempts"] == 2660.0
    assert len(second) == 1                       # this-run records only

    # records without prior file: merged() of a fresh path is empty
    assert StageLog(str(tmp_path / "none.jsonl")).merged() == []


@pytest.mark.slow
def test_bench_e2e_run_stage_retries_with_resume(tmp_path):
    """A hung stage is killed at the per-stage timeout and retried with the
    resume overrides appended (the AUTO_RESUME restart story for a wedged
    device tunnel)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench_e2e import run_stage

    marker = tmp_path / "second_attempt"
    prog = (
        "import os, sys, time\n"
        # first attempt: no resume flag appended -> hang past the timeout
        "if 'RESUME' not in sys.argv: time.sleep(300)\n"
        "open(%r, 'w').close()\n" % str(marker)
    )
    results = []
    # timeout must cover interpreter startup under a loaded 1-core host (the
    # hang branch sleeps far longer, so the distinction stays unambiguous)
    wall = run_stage("fake", [sys.executable, "-c", prog], results,
                     timeout=20.0, retries=1, resume_extra=["RESUME"])
    assert marker.exists()
    assert results[-1] == {"stage": "fake", "wall_s": round(wall, 1),
                           "ok": True, "attempts": 2}

    # a stage that never succeeds exhausts its retries and raises
    results = []
    with pytest.raises(AssertionError):
        run_stage("dead", [sys.executable, "-c", "raise SystemExit(3)"],
                  results, timeout=5.0, retries=1)
    assert results[-1]["ok"] is False and results[-1]["attempts"] == 2


def test_conv_as_patches_matmul_matches_conv():
    """Pin the patches-matmul conv formulation (bench_profile.py conv-bwd
    probe) against lax conv: values AND weight-gradients, both stem geometries
    (k4 s2 and k3 s1), fp32."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench_profile import conv_as_patches_matmul

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 20, 5))
    for kshape, stride in (((4, 4, 5, 7), (2, 2)), ((3, 3, 5, 7), (1, 1))):
        w = jax.random.normal(jax.random.PRNGKey(1), kshape) * 0.2

        def conv_ref(w):
            return jax.lax.conv_general_dilated(
                x, w, stride, [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv_mm(w):
            return conv_as_patches_matmul(x, w, stride, [(1, 1), (1, 1)])

        np.testing.assert_allclose(conv_mm(w), conv_ref(w), atol=2e-4)
        g_ref = jax.grad(lambda w: jnp.sum(conv_ref(w) ** 2))(w)
        g_mm = jax.grad(lambda w: jnp.sum(conv_mm(w) ** 2))(w)
        np.testing.assert_allclose(g_mm, g_ref, rtol=2e-4, atol=2e-3)


def test_bench_supervisor_always_emits_json(monkeypatch, capsys):
    """The bench supervisor's contract with the driver: exactly one JSON
    metric line lands on stdout whatever the child attempts do.  Round 4's
    outage killed an attempt mid-bench with a backend FailedPrecondition and
    the pre-supervisor bench exited with a bare traceback and NO line."""
    import json as _json
    import subprocess
    import sys
    import types

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    import bench

    monkeypatch.setattr(bench, "_wait_for_device", lambda **kw: True)

    # every attempt dies without a metric -> supervisor must emit the zero
    def fail_run(*a, **kw):
        return types.SimpleNamespace(returncode=1, stdout="", stderr="")

    monkeypatch.setattr(subprocess, "run", fail_run)
    try:
        bench.main()
    except SystemExit as e:
        assert e.code == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = _json.loads(out[0])
    assert rec["metric"] == "pose_frames_per_sec_per_chip"
    assert rec["value"] == 0 and "error" in rec

    # a flaky first attempt, then success -> supervisor forwards the child's
    # positive line verbatim and exits 0
    good = _json.dumps({"metric": "pose_frames_per_sec_per_chip",
                        "value": 871234.5, "unit": "frames/s",
                        "vs_baseline": 871.234})
    calls = {"n": 0}

    def flaky_run(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return types.SimpleNamespace(returncode=1, stdout="", stderr="")
        return types.SimpleNamespace(returncode=0, stdout="junk\n" + good + "\n",
                                     stderr="[bench] ok\n")

    monkeypatch.setattr(subprocess, "run", flaky_run)
    try:
        bench.main()
    except SystemExit as e:
        assert e.code == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [good]
    assert calls["n"] == 2


def test_bench_e2e_log_breakdown(tmp_path):
    """The production stage records must explain their wall: parse a
    synthetic training log into spawn/setup/compile/train/validate/ckpt
    buckets (bench_e2e.parse_log_breakdown)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench_e2e import parse_log_breakdown

    exp = tmp_path / "2026-08-19_x_tag"
    exp.mkdir()
    lines = [
        "2026-08-19 00:00:10,000 [INFO] log path: x.log",
        "2026-08-19 00:00:30,000 [INFO] Training begins!",
        # epoch 1 (compile-heavy): 100 s
        "2026-08-19 00:02:10,000 [INFO] [TRAIN] epoch_time: 0.03 hours  ETA: 1",
        # epoch 2: 10 s
        "2026-08-19 00:02:20,000 [INFO] [TRAIN] epoch_time: 0.00 hours  ETA: 1",
        # epoch 3 contains a validation (4 s) and a checkpoint (2.5 s)
        "2026-08-19 00:02:21,000 [INFO] Validation begins!",
        "2026-08-19 00:02:25,000 [INFO] [VAL] epoch: 3/3  val_time: 0.1 min",
        "2026-08-19 00:02:30,000 [INFO] Finished async_save (blocking + "
        "background). Time taken: 2.500000s. directory=/x",
        "2026-08-19 00:02:36,000 [INFO] [TRAIN] epoch_time: 0.00 hours  ETA: 0",
    ]
    (exp / "tag.log").write_text("\n".join(lines) + "\n")

    bd = parse_log_breakdown(str(tmp_path), wall_s=200.0)
    assert bd["log_span_s"] == 146.0
    assert bd["spawn_s"] == 54.0           # wall - log span
    assert bd["setup_s"] == 20.0           # log open -> Training begins!
    assert bd["epochs"] == 3
    assert bd["steady_epoch_s"] == 10.0    # median epoch wall
    assert bd["compile_s"] == 90.0         # first epoch minus steady
    assert bd["validate_s"] == 4.0
    assert bd["ckpt_s"] == 2.5
    # steady train time: total epochs span minus compile/val/ckpt shares
    assert bd["train_s"] == 126.0 - 90.0 - 4.0 - 2.5

    # eval-style log (test/demo): compile bucket = time to the first step
    exp2 = tmp_path / "2026-08-19_y_tag"
    exp2.mkdir()
    (exp2 / "t.log").write_text("\n".join([
        "2026-08-19 01:00:00,000 [INFO] log path: t.log",
        "2026-08-19 01:00:05,000 [INFO] Testing begins!",
        "2026-08-19 01:02:05,000 [INFO] [TEST] epoch: 0/100  step: 1  Saved",
        "2026-08-19 01:02:07,000 [INFO] [TEST] val_time: 2.0 min",
    ]) + "\n")
    # newest log wins (exp2 written after exp)
    bd2 = parse_log_breakdown(str(tmp_path))
    assert bd2["compile_s"] == 120.0 and bd2["eval_s"] == 2.0


def test_bench_e2e_acceptance_bands():
    """Converged production metrics must be checked against the documented
    bands: in-band passes, a regression-scale value or a missing metric
    fails (bench_e2e.check_acceptance)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench_e2e import ACCEPTANCE_BANDS, check_acceptance

    good = {"L2_dist": 153.9, "lip_sync_error_n": 0.80,
            "FGD_mu": 24.3, "FGD_mu_logvar": 24.6}
    assert check_acceptance(good) == []

    # the MEASURED untrained model (probes/untrained_metrics.py, chip run):
    # L2 and FGD must trip the bands even at this mild no-training scale
    bad = dict(good, L2_dist=210.5, FGD_mu=60.7)
    violations = check_acceptance(bad)
    assert any("L2_dist" in v for v in violations)
    assert any("FGD_mu:" in v for v in violations)

    # a silently missing metric is a failure, not a pass
    missing = {k: v for k, v in good.items() if k != "FGD_mu"}
    assert any("missing" in v for v in check_acceptance(missing))
    assert set(ACCEPTANCE_BANDS) == set(good)


def test_jax_cache_enable(tmp_path, monkeypatch):
    """enable_compile_cache points jax at the requested directory, creates
    it, and never raises (a missing cache degrades to a slow run)."""
    import jax

    from speechdrivestemplates_tpu.utils.jax_cache import enable_compile_cache

    target = tmp_path / "cache" / "nested"
    try:
        got = enable_compile_cache(str(target))
        assert got == str(target) and target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
        # env-var fallback
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
        assert enable_compile_cache() == str(tmp_path / "env")
    finally:
        # restore the suite's cache dir (conftest set it for every test)
        import os

        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR"))
