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
  7. --export / --export_torch -- serving artifact + reference-format .pth

Every stage is a subprocess invocation of ``python main.py`` -- exactly what a
user types -- timed wall-clock.  Emits one JSON line per stage and a summary.

Usage:  python bench_e2e.py [--root DIR] [--train 1024] [--dev 131]
                            [--epochs 100] [--batch 32] [--stages 1234567]
                            [--stage_timeout 5400] [--light_timeout 1800]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


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
              out_dir: str | None = None) -> float:
    """Run one CLI stage; on a hang (per-stage ``timeout``) or crash, retry up
    to ``retries`` times with ``resume_extra`` appended (for training stages:
    ``TRAIN.AUTO_RESUME True``, so the retry continues from the newest
    checkpoint instead of restarting).  A wedged device tunnel — observed
    once in production: the chip stopped answering mid-epoch and the
    subprocess blocked forever on the device fence — then costs one timeout
    window, not the whole run."""
    resumed_from = preexisting_epoch(out_dir) if out_dir else None
    if resumed_from is not None:
        print(f"[{name}] NOTE: resuming from pre-existing epoch-{resumed_from} "
              f"checkpoint; wall_s measures the remainder, not a fresh run",
              flush=True)
    tic = time.time()
    for attempt in range(retries + 1):
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
                    help="subset of stage digits to run")
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
    t_train = dict(timeout=args.stage_timeout or None, retries=2,
                   resume_extra=["TRAIN.AUTO_RESUME", "True"])
    t_light = dict(timeout=args.light_timeout or None, retries=1)

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
            "SYS.OUTPUT_DIR", os.path.join(args.root, "out_test")], results, **t_light)
        m = grep_metrics(os.path.join(args.root, "out_test"))
        print("test metrics:", json.dumps(m), flush=True)
        results.append({"stage": "test_metrics", **m})

    if "6" in args.stages:
        run_stage("demo(wav->mp4)", [
            py, "main.py", "--config_file", "configs/voice2pose_sdt_bp.yaml",
            "--demo_input", demo_wav, "--checkpoint", bp_ckpt,
            "--tag", "prod", *common,
            "SYS.OUTPUT_DIR", os.path.join(args.root, "out_demo"),
            "TEST.SAVE_VIDEO", "True"], results, **t_light)  # later KEY VALUE wins
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
        # close the loop: serve from the exported artifact with the standalone
        # runner (imports nothing from the framework)
        run_stage("serve(artifact)", [
            py, "serving/run_artifact.py",
            os.path.join(args.root, "serving_artifact"), demo_wav,
            os.path.join(args.root, "served_poses.npz")]
            + (["--platform", args.platform] if args.platform else []),
            results, **t_light)
        import numpy as np
        poses = np.load(os.path.join(args.root, "served_poses.npz"))
        shp = {k: list(poses[k].shape) for k in poses.files}
        print("served artifact output:", shp, flush=True)
        results.append({"stage": "served_output", **{k: str(v)
                                                     for k, v in shp.items()}})

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
