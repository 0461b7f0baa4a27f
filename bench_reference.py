"""Measure the REFERENCE implementation's train-step rate on this host's CPU.

BASELINE.md's north star ("pose-frames/s at >=10x the reference step rate")
needs a measured denominator.  The reference is CUDA-only as written; this
harness (tests/_reference.py) runs its unmodified Voice2PoseModel + optimizer
step on CPU via .cuda() no-ops, on the same synthetic batch our bench uses.

CAVEAT (documented in BASELINE.md): this is torch-CPU on a 1-core dev host,
not the paper's GPU.  It anchors a same-host comparison (our jax-CPU step on
identical hardware) and a FLOPs-based scaling argument, not a GPU-vs-TPU race.

Usage: python bench_reference.py [batch] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))


def main(batch: int = 32, iters: int = 5):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from _reference import install_reference_stubs, reference_voice2pose_step

    torch = install_reference_stubs()
    import core.pipelines.voice2pose as ref_v2p

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "configs",
                                     "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = batch
    cfg.TRAIN.VALIDATE = False
    cfg.TRAIN.SAVE_VIDEO = False
    cfg.SYS.MESH.DATA = 1

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_speaker(tmp, "oliver", num_train=batch, num_dev=0)
        cfg.DATASET.ROOT_DIR = tmp
        cfg.freeze()
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        batch_np = next(iter(pipe.train_dataloader))

        torch.manual_seed(0)
        tmodel = ref_v2p.Voice2PoseModel(cfg, num_train_samples=batch)
        tmodel.train()
        opts = {"optimizerG": torch.optim.Adam(tmodel.netG.parameters(),
                                               lr=cfg.TRAIN.LR,
                                               weight_decay=cfg.TRAIN.WD),
                "optimizerClipCode": torch.optim.Adam(
                    [tmodel.clips_code],
                    lr=cfg.TRAIN.LR
                    * cfg.VOICE2POSE.GENERATOR.CLIP_CODE.LR_SCALING)}

        tb = {"audio": torch.from_numpy(np.asarray(batch_np["audio"])),
              "poses": torch.from_numpy(np.asarray(batch_np["poses"])),
              "clip_index": torch.from_numpy(
                  np.asarray(batch_np["clip_index"], dtype=np.int64)),
              "num_frames": torch.full((batch,), 64, dtype=torch.int64),
              "speaker": ["oliver"] * batch}

        reference_voice2pose_step(tmodel, opts, tb)  # warm
        tic = time.perf_counter()
        for _ in range(iters):
            reference_voice2pose_step(tmodel, opts, tb)
        dt = (time.perf_counter() - tic) / iters
        sps = 1.0 / dt
        print(f"[bench_reference] torch-CPU train step (SDT-BP, batch {batch}): "
              f"{dt*1e3:.1f} ms/step = {sps:.3f} steps/s", file=sys.stderr)

        # our jax step on the SAME host CPU, same batch (same-hardware ratio)
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        step_fn = pipe._get_train_step()
        db = pipe._device_batch(batch_np)
        state = pipe.state
        state, losses, _ = step_fn(state, db, jax.random.PRNGKey(0))  # compile
        float(np.asarray(losses["G_loss"]))
        tic = time.perf_counter()
        for i in range(iters):
            state, losses, _ = step_fn(state, db, jax.random.PRNGKey(i))
        float(np.asarray(losses["G_loss"]))
        dt_j = (time.perf_counter() - tic) / iters
        print(f"[bench_reference] jax-CPU  train step (same host, fp32): "
              f"{dt_j*1e3:.1f} ms/step = {1/dt_j:.3f} steps/s", file=sys.stderr)

    out = {"metric": "reference_torch_cpu_steps_per_sec",
           "torch_cpu_steps_per_sec": round(sps, 4),
           "jax_cpu_steps_per_sec": round(1 / dt_j, 4),
           "batch": batch, "host_cpus": os.cpu_count()}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    main(b, n)
