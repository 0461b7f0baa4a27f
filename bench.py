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


def bench_inference(batch: int = 32, iters: int = 40, warmup: int = 5):
    """Device-resident throughput: inputs are pre-staged on the device (several
    distinct buffers, cycled, so no execution can be deduped) and host<->device
    transfer is excluded — the production loader overlaps it with compute."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import entry

    fn, (variables, audio, code) = entry()
    rng = np.random.RandomState(0)
    n_bufs = 4
    audios = [jax.device_put(jnp.asarray(
        rng.randn(batch, audio.shape[-1]).astype(np.float32) * 0.1))
        for _ in range(n_bufs)]
    codes = [jax.device_put(jnp.asarray(
        rng.randn(batch, code.shape[-1]).astype(np.float32)))
        for _ in range(n_bufs)]
    jfn = jax.jit(fn)

    out = jfn(variables, audios[0], codes[0])
    out.block_until_ready()
    for i in range(warmup):
        jfn(variables, audios[i % n_bufs], codes[i % n_bufs]).block_until_ready()

    tic = time.perf_counter()
    for i in range(iters):
        out = jfn(variables, audios[i % n_bufs], codes[i % n_bufs])
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

        dbs = [pipe._device_batch(b) for b in pipe.train_dataloader]
        step_fn = pipe._get_train_step()
        rngs = [jax.random.PRNGKey(i) for i in range(4)]

        state = pipe.state
        for i in range(warmup):
            state, losses, _ = step_fn(state, dbs[i % len(dbs)], rngs[i % 4])
        jax.block_until_ready(losses)
        tic = time.perf_counter()
        for i in range(iters):
            state, losses, _ = step_fn(state, dbs[i % len(dbs)], rngs[i % 4])
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
