"""Full-budget production workflow on real hardware, through the public CLI.

Runs the COMPLETE reference user chain (reference README "Training"/"Testing"/
"Demo" sections; core/pipelines/trainer.py:367,429,459) at the reference's
default training budget (TRAIN.NUM_EPOCHS=100, configs/default.py:60) on a
generated reference-layout dataset:

  1. pose2pose.yaml        -- train the pose VAE 100 epochs (template codes)
  2. voice2pose_sdt_bp.yaml -- train SDT-BP 100 epochs (FGD encoder from 1)
  3. voice2pose_sdt_vae.yaml -- train SDT-VAE 100 epochs (external bank from 1)
  4. voice2pose_s2g.yaml   -- train the GAN baseline 100 epochs
  5. --test_only           -- SDT-BP eval (L2 / lip-sync / FGD) from 2's ckpt
  6. --demo_input demo.wav -- wav -> rendered mp4 from 2's ckpt
  7. --export / --export_torch -- serving artifacts (batch-1 + batch-128,
     the latter slope-timed on the chip) + reference-format .pth
  8. warm-cache reruns (pose2pose, sdt_bp, test) -- same commands, fresh
     output dirs, persistent XLA compile cache already populated: the wall
     delta vs stages 1/2/5 is the compile share the cache eliminates

Every stage is a subprocess invocation of ``python main.py`` -- exactly what a
user types -- timed wall-clock, with a per-stage phase breakdown parsed from
the experiment log (parse_log_breakdown) and acceptance-band checks on the
converged test metrics (check_acceptance).  Emits one JSON line per stage and
a summary.

Usage:  python bench_e2e.py [--root DIR] [--train 1024] [--dev 131]
                            [--epochs 100] [--batch 32] [--stages 12345678]
                            [--stage_timeout 5400] [--light_timeout 1800]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time
from datetime import datetime

REPO = os.path.dirname(os.path.abspath(__file__))

_TS_RE = re.compile(r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) ")
_CKPT_RE = re.compile(
    r"Finished async_save \(blocking \+ background\)\. Time taken: ([0-9.]+)")


def _ts(line: str):
    m = _TS_RE.match(line)
    if not m:
        return None
    return datetime.strptime(m.group(1), "%Y-%m-%d %H:%M:%S,%f").timestamp()


def parse_log_breakdown(out_dir: str, wall_s: float | None = None) -> dict:
    """Phase breakdown of a stage's wall from its newest experiment log, so
    the jsonl explains where every production second went (the round-4 stage
    walls were 20-100x the chip-step cost with no accounting).

    Buckets (seconds, summing to ~wall_s):
      spawn_s       process start -> first log line (imports + device init)
      setup_s       first log line -> '* begins!' (dataset, model, ckpt load)
      compile_s     first work unit minus the steady-state unit (train: first
                    epoch vs median epoch; test/demo: time to first step —
                    there IS no steady unit, eval compiles once and streams)
      train_s       steady training-step time (epoch walls minus validate,
                    checkpoint and compile shares)
      validate_s    sum of 'Validation begins!' -> '... val_time:' intervals
      ckpt_s        sum of orbax async_save commit times
      tail_s        after the last epoch/step line (final eval, video, exit)
    """
    logs = sorted(glob.glob(os.path.join(out_dir, "*", "*.log")),
                  key=os.path.getmtime)
    if not logs:
        return {}
    with open(logs[-1], errors="replace") as f:
        lines = [ln for ln in f if _TS_RE.match(ln)]
    if len(lines) < 2:
        return {}
    t0, t_end = _ts(lines[0]), _ts(lines[-1])
    out = {"log_span_s": t_end - t0}
    if wall_s is not None and wall_s > out["log_span_s"]:
        out["spawn_s"] = wall_s - out["log_span_s"]

    t_begin = None
    epoch_ts, ckpt_s, val_s = [], 0.0, 0.0
    first_step_ts = None
    val_open = None
    for ln in lines:
        t = _ts(ln)
        if t_begin is None and re.search(r"(Training|Testing|Demo) begins!", ln):
            t_begin = t
        elif "Validation begins!" in ln:
            val_open = t
        elif val_open is not None and "val_time:" in ln:
            val_s += t - val_open
            val_open = None
        elif "[TRAIN] epoch_time:" in ln:
            epoch_ts.append(t)
        elif (first_step_ts is None
              and re.search(r"\[(TEST|DEMO)\] epoch: \S+ +step: 1\b", ln)):
            first_step_ts = t
        m = _CKPT_RE.search(ln)
        if m:
            ckpt_s += float(m.group(1))
    if t_begin is None:
        return {k: round(v, 1) for k, v in out.items()}
    out["setup_s"] = t_begin - t0
    if epoch_ts:  # training stage
        walls = [b - a for a, b in zip([t_begin] + epoch_ts[:-1], epoch_ts)]
        # steady-state epoch: the fastest non-first epoch (median would be
        # inflated by the epochs that also validated/checkpointed)
        steady = min(walls[1:]) if len(walls) > 1 else walls[0]
        out["compile_s"] = max(0.0, walls[0] - steady)
        out["validate_s"] = val_s
        out["ckpt_s"] = ckpt_s
        out["train_s"] = max(0.0, (epoch_ts[-1] - t_begin) - out["compile_s"]
                             - val_s - ckpt_s)
        out["tail_s"] = t_end - epoch_ts[-1]
        out["epochs"] = len(epoch_ts)
        out["steady_epoch_s"] = steady
    elif first_step_ts is not None:  # test/demo stage
        out["compile_s"] = first_step_ts - t_begin
        out["eval_s"] = t_end - first_step_ts
    return {k: (round(v, 1) if isinstance(v, float) else v)
            for k, v in out.items()}


# Acceptance bands for the converged production metrics on the synthetic
# fixture (1024+131 clips, 100 epochs, batch 32, seed 0).  Derivation
# (docs/PERF.md "Acceptance bands"): the training dynamics are pinned to the
# unmodified torch reference to ~1.6e-6 relative over 72 steps
# (tests/test_convergence_parity.py), so a converged jax run IS the reference
# result up to data order and eval-code sampling; the bands are the measured
# round-4/round-5 production values widened to cover that sampling variation
# (the eval samples N(0,I) template codes, reference voice2pose.py:92-122)
# while still failing on an optimizer-class regression.  The far end is
# MEASURED (probes/untrained_metrics.py on this fixture): the untrained model
# scores L2 210.5, FGD_mu 60.7, FGD_mu_logvar 62.2 — the upper edges sit
# between the converged point and that floor.  lip_sync_error_n is NOT
# discriminative on the synthetic fixture (untrained 0.83 lands near the
# converged 0.80); it is kept as a sanity range only.
ACCEPTANCE_BANDS = {
    "L2_dist": (100.0, 185.0),        # converged 153.9 (r4+r5) | untrained 210.5
    "lip_sync_error_n": (0.45, 1.10),  # converged 0.80 (sanity only, see above)
    "FGD_mu": (2.0, 45.0),             # converged 24.3 | untrained 60.7
    "FGD_mu_logvar": (2.0, 45.0),      # converged 24.6 | untrained 62.2
}


def check_acceptance(metrics: dict) -> list[str]:
    """Violation strings for any metric outside its band ([] = accepted)."""
    bad = []
    for key, (lo, hi) in ACCEPTANCE_BANDS.items():
        if key not in metrics:
            bad.append(f"{key}: missing from test metrics")
        elif not (lo <= metrics[key] <= hi):
            bad.append(f"{key}: {metrics[key]} outside [{lo}, {hi}]")
    return bad


def latest_ckpt(out_dir: str) -> str:
    """Newest checkpoint by (epoch, step) — parsed numerically: a lexicographic
    sort would rank epoch-90 above epoch-100."""
    def key(path):
        name = os.path.basename(path)
        try:
            return (int(name.split("epoch-")[1].split("_")[0]),
                    int(name.split("step-")[1]))
        except (IndexError, ValueError):
            return (-1, -1)

    cands = sorted(glob.glob(os.path.join(out_dir, "*", "checkpoints", "*")),
                   key=key)
    assert cands and key(cands[-1]) != (-1, -1), f"no checkpoint under {out_dir}"
    return cands[-1]


def preexisting_epoch(out_dir: str):
    """Epoch of the newest checkpoint already under ``out_dir`` (None if none):
    with TRAIN.AUTO_RESUME in the common overrides, a relaunched invocation
    continues from it, so the stage's wall time is NOT a fresh full run and
    must be recorded as such."""
    try:
        name = os.path.basename(latest_ckpt(out_dir))
        return int(name.split("epoch-")[1].split("_")[0])
    except (AssertionError, IndexError, ValueError):
        return None


class StageLog(list):
    """Stage records for THIS invocation, mirrored append-only to
    ``<root>/stages_<config>.jsonl`` so records survive a mid-run death (observed in
    production: the device tunnel wedged at stage 2 and the orchestrator was
    killed, losing stage 1's record).  The final summary is composed from the
    jsonl (latest record per stage wins), so an outage costs a re-launch of
    the remaining ``--stages`` digits, not the evidence."""

    def __init__(self, path: str):
        super().__init__()
        self.path = path

    def append(self, rec):  # noqa: A003 - list interface
        super().append(rec)
        with open(self.path, "ab+") as f:
            # a kill mid-append can leave a torn final line with no newline;
            # repair it so this record isn't destroyed by concatenation
            f.seek(0, os.SEEK_END)
            if f.tell() > 0:
                f.seek(-1, os.SEEK_END)
                if f.read(1) != b"\n":
                    f.write(b"\n")
            f.write((json.dumps(rec) + "\n").encode())

    def merged(self) -> list:
        """Latest record per stage, in first-seen order; ``wall_s_all_attempts``
        accumulates wall_s across every record of that stage (a failed earlier
        invocation's time is real cost even though its record is superseded).
        Torn/malformed lines (killed mid-write) are skipped, not fatal."""
        by_stage, walls, order = {}, {}, []
        try:
            with open(self.path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                        name = rec["stage"]
                    except (json.JSONDecodeError, KeyError, TypeError):
                        continue
                    if name not in by_stage:
                        order.append(name)
                    by_stage[name] = rec
                    walls[name] = walls.get(name, 0.0) + rec.get("wall_s", 0.0)
        except FileNotFoundError:
            pass
        out = []
        for s in order:
            rec = dict(by_stage[s])
            if walls[s] > rec.get("wall_s", 0.0):
                rec["wall_s_all_attempts"] = round(walls[s], 1)
            out.append(rec)
        return out


def run_stage(name: str, argv: list[str], results: list, env=None,
              timeout: float | None = None, retries: int = 0,
              resume_extra: list[str] | None = None,
              out_dir: str | None = None, probe: bool = False,
              log_dir: str | None = None) -> float:
    """Run one CLI stage; on a hang (per-stage ``timeout``) or crash, retry up
    to ``retries`` times with ``resume_extra`` appended (for training stages:
    ``TRAIN.AUTO_RESUME True``, so the retry continues from the newest
    checkpoint instead of restarting).  A wedged device tunnel — observed
    once in production: the chip stopped answering mid-epoch and the
    subprocess blocked forever on the device fence — then costs one timeout
    window, not the whole run.

    ``probe``: gate the launch on the shared device-liveness probe
    (bench_common.wait_for_device) so a dead tunnel costs minutes of probing,
    not a full ``timeout`` window of a silently hung subprocess.
    ``log_dir``: experiment dir whose newest log feeds the wall breakdown
    (defaults to ``out_dir``)."""
    resumed_from = preexisting_epoch(out_dir) if out_dir else None
    if resumed_from is not None:
        print(f"[{name}] NOTE: resuming from pre-existing epoch-{resumed_from} "
              f"checkpoint; wall_s measures the remainder, not a fresh run",
              flush=True)
    tic = time.time()
    for attempt in range(retries + 1):
        if probe:
            sys.path.insert(0, REPO)
            from bench_common import wait_for_device

            if not wait_for_device(max_wait_s=600, tag=name):
                print(f"[{name}] device unreachable after probing; "
                      f"launching anyway (the per-stage timeout bounds it)",
                      flush=True)
        cmd = list(argv) + (resume_extra if attempt and resume_extra else [])
        print(f"\n=== [{name}] (attempt {attempt + 1}) {' '.join(cmd)}",
              flush=True)
        try:
            proc = subprocess.run(cmd, cwd=REPO, env=env, timeout=timeout)
            code = proc.returncode
        except subprocess.TimeoutExpired:
            code = "timeout"
        if code == 0:
            break
        print(f"stage {name} attempt {attempt + 1} -> {code}", flush=True)
    wall = time.time() - tic
    rec = {"stage": name, "wall_s": round(wall, 1), "ok": code == 0,
           "attempts": attempt + 1}
    if resumed_from is not None:
        rec["resumed_from_epoch"] = resumed_from
    bd = parse_log_breakdown(log_dir or out_dir, wall) if (log_dir or out_dir) else {}
    if bd:
        rec["breakdown"] = bd
    results.append(rec)
    print(json.dumps(rec), flush=True)
    assert code == 0, f"stage {name} failed ({code})"
    return wall


def grep_metrics(out_dir: str) -> dict:
    """Pull the last test/val metric line out of the newest experiment log."""
    logs = sorted(glob.glob(os.path.join(out_dir, "*", "*.log")))
    if not logs:
        return {}
    metrics = {}
    with open(logs[-1]) as f:
        for line in f:
            # anchored on a leading space so e.g. 'reg_loss:' cannot match
            # inside 'G_reg_loss:' (logger format is '  <name>: <val>')
            for key in ("L2_dist", "lip_sync_error_n", "FGD_mu", "FGD_mu_logvar",
                        "G_reg_loss", "reg_loss", "kl_loss"):
                tok = " " + key + ":"
                if tok in line:
                    try:
                        val = float(line.split(tok)[1].split()[0].rstrip(","))
                        metrics[key] = val
                    except (ValueError, IndexError):
                        pass
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/sdt_production")
    ap.add_argument("--train", type=int, default=1024)
    ap.add_argument("--dev", type=int, default=131)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--stages", default="1234567",
                    help="subset of stage digits to run (8 = warm-compile-"
                         "cache reruns of pose2pose + sdt_bp + test into "
                         "fresh output dirs, quantifying the compile share "
                         "the persistent cache eliminates; 9 = dispatch-"
                         "amortized pose2pose rerun at "
                         "TRAIN.STEPS_PER_DISPATCH=32, quantifying the host-"
                         "dispatch share the chunked scan removes)")
    ap.add_argument("--stage_timeout", type=float, default=5400,
                    help="seconds before a hung training stage is killed and "
                         "retried with TRAIN.AUTO_RESUME (0 = no timeout)")
    ap.add_argument("--light_timeout", type=float, default=1800,
                    help="same, for the non-training stages (test/demo/"
                         "export/serve; 0 = no timeout)")
    ap.add_argument("--platform", default="",
                    help="pin SYS.PLATFORM in every stage (e.g. 'cpu' for a "
                         "smoke run while the TPU tunnel is down)")
    args = ap.parse_args()
    probe = args.platform != "cpu"  # liveness-probe the chip before launching
    t_train = dict(timeout=args.stage_timeout or None, retries=2,
                   resume_extra=["TRAIN.AUTO_RESUME", "True"], probe=probe)
    t_light = dict(timeout=args.light_timeout or None, retries=1, probe=probe)

    data_root = os.path.join(args.root, "speakers")
    demo_wav = os.path.join(args.root, "demo_audio.wav")
    marker = os.path.join(data_root, "oliver",
                          f".generated_{args.train}_{args.dev}")
    if not os.path.exists(marker):
        from speechdrivestemplates_tpu.datasets.synthetic import (
            make_demo_wav, make_synthetic_speaker)

        print(f"generating {args.train}+{args.dev} clips under {data_root} ...",
              flush=True)
        tic = time.time()
        make_synthetic_speaker(data_root, "oliver", num_train=args.train,
                               num_dev=args.dev)
        make_demo_wav(demo_wav, seconds=8.0)
        open(marker, "w").close()
        print(f"dataset generated in {time.time() - tic:.1f}s", flush=True)

    common = ["DATASET.ROOT_DIR", data_root, "DATASET.SPEAKER", "oliver",
              "DATASET.CACHING", "True",
              # outage hardening: a killed/retried training stage continues
              # from its newest checkpoint instead of restarting (no-op on a
              # fresh output dir)
              "TRAIN.AUTO_RESUME", "True",
              "TRAIN.NUM_EPOCHS", str(args.epochs),
              "TRAIN.BATCH_SIZE", str(args.batch),
              "TEST.BATCH_SIZE", str(args.batch),
              "TRAIN.CHECKPOINT_INTERVAL", str(min(10, args.epochs)),
              "TRAIN.SAVE_VIDEO", "False", "TEST.SAVE_VIDEO", "False",
              "SYS.LOG_INTERVAL", "200", "SYS.NUM_WORKERS", "2"]
    if args.platform:
        common += ["SYS.PLATFORM", args.platform]
    py = sys.executable
    # keyed by run configuration so a smoke run and a production run sharing
    # --root can never merge their records into one summary
    results = StageLog(os.path.join(
        args.root,
        f"stages_{args.train}x{args.epochs}ep_b{args.batch}.jsonl"))
    out = {k: os.path.join(args.root, f"out_{k}")
           for k in ("p2p", "bp", "vae", "s2g")}

    total_tic = time.time()
    if "1" in args.stages:
        run_stage("pose2pose-100ep", [
            py, "main.py", "--config_file", "configs/pose2pose.yaml",
            "--tag", "prod", *common, "SYS.OUTPUT_DIR", out["p2p"]], results, out_dir=out["p2p"], **t_train)
    ae_ckpt = (latest_ckpt(out["p2p"])
               if any(s in args.stages for s in "2345") else None)

    if "2" in args.stages:
        run_stage("sdt_bp-100ep", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_bp.yaml",
            "--tag", "prod", *common,
            "VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT", ae_ckpt,
            "SYS.OUTPUT_DIR", out["bp"]], results, out_dir=out["bp"], **t_train)

    if "3" in args.stages:
        run_stage("sdt_vae-100ep", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_vae.yaml",
            "--tag", "prod", *common,
            "VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT", ae_ckpt,
            "SYS.OUTPUT_DIR", out["vae"]], results, out_dir=out["vae"], **t_train)

    if "4" in args.stages:
        run_stage("s2g_gan-100ep", [
            py, "main.py", "--config_file", "configs/voice2pose_s2g.yaml",
            "--tag", "prod", *common,
            "VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT", ae_ckpt,
            "SYS.OUTPUT_DIR", out["s2g"]], results, out_dir=out["s2g"], **t_train)

    bp_ckpt = (latest_ckpt(out["bp"])
               if any(s in args.stages for s in "567") else None)
    if "5" in args.stages:
        run_stage("test_only(sdt_bp)", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_bp.yaml",
            "--test_only", "--checkpoint", bp_ckpt, "--tag", "prod", *common,
            "VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT", ae_ckpt,
            "SYS.OUTPUT_DIR", os.path.join(args.root, "out_test")], results,
            log_dir=os.path.join(args.root, "out_test"), **t_light)
        m = grep_metrics(os.path.join(args.root, "out_test"))
        print("test metrics:", json.dumps(m), flush=True)
        results.append({"stage": "test_metrics", **m})
        # Acceptance bands: converged metrics must land inside the documented
        # ranges (an optimizer regression that converges to a worse optimum
        # now FAILS the chain instead of logging different numbers).  Only
        # enforced at the reference budget the bands were derived for.
        if (args.train, args.epochs, args.batch) == (1024, 100, 32):
            violations = check_acceptance(m)
            results.append({"stage": "acceptance", "ok": not violations,
                            "violations": violations,
                            "bands": {k: list(v) for k, v in
                                      ACCEPTANCE_BANDS.items()}})
            assert not violations, f"acceptance bands violated: {violations}"

    if "6" in args.stages:
        run_stage("demo(wav->mp4)", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_bp.yaml",
            "--demo_input", demo_wav, "--checkpoint", bp_ckpt,
            "--tag", "prod", *common,
            "SYS.OUTPUT_DIR", os.path.join(args.root, "out_demo"),
            "TEST.SAVE_VIDEO", "True"], results,
            log_dir=os.path.join(args.root, "out_demo"), **t_light)  # later KEY VALUE wins
        vids = glob.glob(os.path.join(args.root, "out_demo", "*", "**", "*.mp4"),
                         recursive=True)
        print("demo artifacts:", vids, flush=True)
        results.append({"stage": "demo_artifacts", "mp4": len(vids)})

    if "7" in args.stages:
        run_stage("export(stablehlo)", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_bp.yaml",
            "--checkpoint", bp_ckpt, "--export",
            os.path.join(args.root, "serving_artifact"), "--tag", "prod",
            *common, "SYS.OUTPUT_DIR", os.path.join(args.root, "out_export")],
            results, **t_light)
        run_stage("export_torch(.pth)", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_bp.yaml",
            "--checkpoint", bp_ckpt, "--export_torch",
            os.path.join(args.root, "sdt_bp_prod.pth"), "--tag", "prod",
            *common, "SYS.OUTPUT_DIR", os.path.join(args.root, "out_export")],
            results, **t_light)
        # throughput serving point: same checkpoint exported at batch 128
        # (the measured v5e sweet spot, bench.py) so the zero-framework
        # artifact path has its own frames/s number next to the in-framework
        # one
        run_stage("export(stablehlo,b128)", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_bp.yaml",
            "--checkpoint", bp_ckpt, "--export",
            os.path.join(args.root, "serving_artifact_b128"),
            "--export_batch", "128", "--tag", "prod",
            *common, "SYS.OUTPUT_DIR", os.path.join(args.root, "out_export"),
            # the throughput serving point is bf16 (PERF.md headline); the
            # batch-1 artifact above keeps the training precision
            "TRAIN.PRECISION", "bf16"],
            results, **t_light)
        # close the loop: serve from the exported artifact with the standalone
        # runner (imports nothing from the framework), and slope-time the
        # batch-128 artifact on the chip
        bench_out = os.path.join(args.root, "served_bench.json")
        run_stage("serve(artifact)", [
            py, "serving/run_artifact.py",
            os.path.join(args.root, "serving_artifact"), demo_wav,
            os.path.join(args.root, "served_poses.npz")]
            + (["--platform", args.platform] if args.platform else []),
            results, **t_light)
        run_stage("serve_bench(b128)", [
            py, "serving/run_artifact.py",
            os.path.join(args.root, "serving_artifact_b128"), demo_wav,
            os.path.join(args.root, "served_poses_b128.npz"),
            "--bench", "40", "--bench-out", bench_out]
            + (["--platform", args.platform] if args.platform else []),
            results, **t_light)
        import numpy as np
        poses = np.load(os.path.join(args.root, "served_poses.npz"))
        shp = {k: list(poses[k].shape) for k in poses.files}
        with open(bench_out) as f:
            served_fps = json.load(f)
        print("served artifact output:", shp, served_fps, flush=True)
        results.append({"stage": "served_output",
                        "frames_per_sec_b128": served_fps["value"],
                        "per_call_ms_b128": served_fps["per_call_ms"],
                        **{k: str(v) for k, v in shp.items()}})

    if "8" in args.stages:
        # Warm-compile-cache reruns into FRESH output dirs (AUTO_RESUME would
        # otherwise skip the training): the only difference from stages 1/2/5
        # is that ~/.cache/sdt_jax is already populated, so the wall delta IS
        # the compile share the persistent cache eliminates.
        warm = {k: os.path.join(args.root, f"out_{k}_warm")
                for k in ("p2p", "bp")}
        run_stage("pose2pose-100ep-warm", [
            py, "main.py", "--config_file", "configs/pose2pose.yaml",
            "--tag", "prod", *common, "SYS.OUTPUT_DIR", warm["p2p"]],
            results, out_dir=warm["p2p"], **t_train)
        ae_warm = latest_ckpt(warm["p2p"])
        run_stage("sdt_bp-100ep-warm", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_bp.yaml",
            "--tag", "prod", *common,
            "VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT", ae_warm,
            "SYS.OUTPUT_DIR", warm["bp"]], results, out_dir=warm["bp"],
            **t_train)
        run_stage("test_only(sdt_bp)-warm", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_bp.yaml",
            "--test_only", "--checkpoint", latest_ckpt(warm["bp"]),
            "--tag", "prod", *common,
            "VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT", ae_warm,
            "SYS.OUTPUT_DIR", os.path.join(args.root, "out_test_warm")],
            results, log_dir=os.path.join(args.root, "out_test_warm"),
            **t_light)
        m = grep_metrics(os.path.join(args.root, "out_test_warm"))
        print("warm-chain test metrics:", json.dumps(m), flush=True)
        results.append({"stage": "test_metrics_warm", **m})
        # the warm chain is a full independent replicate: its converged
        # metrics must land in the same acceptance bands
        if (args.train, args.epochs, args.batch) == (1024, 100, 32):
            violations = check_acceptance(m)
            results.append({"stage": "acceptance_warm", "ok": not violations,
                            "violations": violations})
            assert not violations, f"acceptance bands violated: {violations}"

    if "9" in args.stages:
        # Dispatch-amortized rerun of the dispatch-bound pose2pose stage:
        # identical training at TRAIN.STEPS_PER_DISPATCH=32 (K steps per
        # device dispatch, a lax.scan over the HBM-resident train cache) into
        # a fresh output dir.  The wall/train_s delta vs pose2pose-100ep-warm
        # IS the host-dispatch share the scan removes — the pose2pose step
        # measured 88% dispatch overhead per call (docs/PERF.md "Pose2Pose
        # train-step floor").
        out_chunk = os.path.join(args.root, "out_p2p_chunked")
        run_stage("pose2pose-100ep-chunked(K=32)", [
            py, "main.py", "--config_file", "configs/pose2pose.yaml",
            "--tag", "prod", *common,
            "TRAIN.STEPS_PER_DISPATCH", "32",
            "SYS.OUTPUT_DIR", out_chunk], results, out_dir=out_chunk,
            **t_train)

    total = time.time() - total_tic
    steps_per_epoch = -(-args.train // args.batch)
    merged = results.merged()
    # The chain's true cost as executed across invocations: every attempt's
    # wall counts (a failed attempt's hours are real cost, and a resumed
    # stage's record alone only holds the remainder).  wall_this_run_s is
    # this process's own wall; they're equal when all 7 stages ran in one go.
    chain_wall = sum(r.get("wall_s_all_attempts", r.get("wall_s", 0.0))
                     for r in merged if r.get("ok"))
    wall_failed = sum(r.get("wall_s_all_attempts", r.get("wall_s", 0.0))
                      for r in merged if r.get("ok") is False)
    summary = {
        "metric": "e2e_production_wall",
        "value": round(chain_wall, 1), "unit": "s",
        "wall_this_run_s": round(total, 1),
        "dataset": f"{args.train}+{args.dev} clips",
        "budget": f"{args.epochs} epochs x {steps_per_epoch} steps, batch {args.batch}",
        "stages": merged,  # incl. records from earlier invocations
        "stages_this_run": [r["stage"] for r in results],
        "wall_failed_attempts_s": round(wall_failed, 1),
    }
    print("\n" + json.dumps(summary), flush=True)
    with open(os.path.join(args.root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
