"""Benchmark harness: wav -> pose demo inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "pose_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 1000}
vs_baseline is against the north-star floor of 1000 pose-frames/sec/chip
(BASELINE.json; the reference publishes no numbers — see BASELINE.md).
Also prints auxiliary lines (train step rate) to stderr for humans.
"""

from __future__ import annotations

import json
import sys
import time


def bench_inference(batch: int = 32, iters: int = 20, warmup: int = 3):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, (variables, audio, code) = entry()
    # scale the batch
    audio = jnp.tile(audio, (max(1, batch // audio.shape[0]), 1))[:batch]
    code = jnp.tile(code, (max(1, batch // code.shape[0]), 1))[:batch]
    jfn = jax.jit(fn)

    out = jfn(variables, audio, code)
    out.block_until_ready()
    for _ in range(warmup):
        jfn(variables, audio, code).block_until_ready()

    tic = time.perf_counter()
    for _ in range(iters):
        out = jfn(variables, audio, code)
    out.block_until_ready()
    toc = time.perf_counter() - tic

    num_frames = out.shape[1]
    frames_per_sec = batch * num_frames * iters / toc
    return frames_per_sec, toc / iters


def bench_train_step(batch: int = 32, iters: int = 10, warmup: int = 2):
    """Full SDT-BP train step rate on synthetic data (steps/sec)."""
    import tempfile

    import jax
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_speaker(tmp, "oliver", num_train=batch, num_dev=0)
        cfg = _flagship_cfg()
        cfg.DATASET.ROOT_DIR = tmp
        cfg.TRAIN.BATCH_SIZE = batch
        cfg.TRAIN.VALIDATE = False
        cfg.TRAIN.SAVE_VIDEO = False
        cfg.freeze()

        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()

        db = pipe._device_batch(next(iter(pipe.train_dataloader)))
        step_fn = pipe._get_train_step()
        rng = jax.random.PRNGKey(0)

        state = pipe.state
        for _ in range(warmup):
            state, losses, _ = step_fn(state, db, rng)
        jax.block_until_ready(losses)
        tic = time.perf_counter()
        for _ in range(iters):
            state, losses, _ = step_fn(state, db, rng)
        jax.block_until_ready(losses)
        toc = time.perf_counter() - tic
        return iters / toc


def main():
    frames_per_sec, step_time = bench_inference()
    print(f"[bench] inference: {frames_per_sec:.1f} pose-frames/s/chip "
          f"({step_time*1e3:.2f} ms / batch-32 fwd)", file=sys.stderr)
    try:
        train_sps = bench_train_step()
        print(f"[bench] train: {train_sps:.2f} steps/s (batch 32, SDT-BP)",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"[bench] train-step bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "pose_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
