#!/usr/bin/env python
"""Acceptance-band floor probe: test metrics of an UNTRAINED model.

The production chain asserts its converged test metrics inside documented
bands (bench_e2e.py ACCEPTANCE_BANDS).  The bands are only meaningful if a
broken training run would land far outside them — this probe measures the
far end: the reference eval protocol (test_only semantics, reference
core/pipelines/voice2pose.py:412-446) run with randomly initialized
generator weights on the same production fixture.  The printed values are
cited in docs/PERF.md ("Acceptance bands") as the no-training baseline the
bands must exclude.

    python probes/untrained_metrics.py --root /tmp/sdt_production \
        [--platform cpu] [--dev 131]

Uses the fixture's val split and the production pose-VAE checkpoint for the
frozen FGD encoder (the encoder is part of the metric, not of the model
under test).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/sdt_production")
    ap.add_argument("--platform", default="",
                    help="pin the jax backend (e.g. 'cpu')")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from bench_e2e import latest_ckpt
    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(REPO, "configs/voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = os.path.join(args.root, "speakers")
    cfg.DATASET.SPEAKER = "oliver"
    cfg.DATASET.CACHING = True
    cfg.TEST.BATCH_SIZE = args.batch
    cfg.TEST.SAVE_NPZ = False
    cfg.TEST.SAVE_VIDEO = False
    cfg.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT = latest_ckpt(
        os.path.join(args.root, "out_p2p"))
    cfg.freeze()

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "test")
    pipe.setup_model(cfg)  # random init; frozen FGD encoder from AE_CHECKPOINT

    tic = time.time()
    losses_sum, epoch_results = {}, {}
    pipe.step_tic = time.time()
    for t_step, batch in enumerate(pipe.test_dataloader):
        batch_losses, batch_results = pipe.test_step(batch, t_step + 1, epoch=0)
        for k, v in batch_losses.items():
            losses_sum[k] = losses_sum[k] + v if k in losses_sum else v
        epoch_results = pipe.concat_tensor_dict(batch_results, epoch_results)
    metrics = {k: float(v / pipe.num_test_samples) for k, v in losses_sum.items()}
    metrics.update({k: float(v) for k, v in pipe.evaluate_epoch(epoch_results).items()})

    out = {"metric": "untrained_test_metrics",
           "wall_s": round(time.time() - tic, 1),
           **{k: round(v, 4) for k, v in metrics.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
