"""Benchmark harness: wav -> pose demo inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "pose_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 1000}
vs_baseline is against the north-star floor of 1000 pose-frames/sec/chip
(BASELINE.json; the reference publishes no numbers — see BASELINE.md).
Also prints auxiliary lines (train step rate) to stderr for humans.

NOTE: run with the chip otherwise idle — device execution is in-order, so a
concurrent TPU process inflates every measurement (a contended run once
recorded 751k frames/s where exclusive runs reproduce ~871k).
"""

from __future__ import annotations

import json
import os
import sys
import time


# Shared outage policy (bench_common.py): module-level aliases so tests can
# monkeypatch bench._wait_for_device, and so bench_profile.py's historical
# `bench._enable_compile_cache()` call keeps working.
from bench_common import enable_compile_cache as _enable_compile_cache
from bench_common import wait_for_device as _wait_for_device


def bench_inference(batch: int = 128, iters: int = 40, warmup: int = 5):
    # batch 128 is the measured serving sweet spot on v5e (703k frames/s vs
    # 578k at batch 32 and 468k at 64 — XLA tiling, see docs/STATUS_r2.md)
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

    def sync(x):
        # A tiny scalar FETCH, not just block_until_ready: through remote-device
        # tunnels block_until_ready can return at dispatch-ack, wildly inflating
        # rates.  Device execution is in-order, so fetching one element of the
        # last output proves every queued call finished.
        return float(np.asarray(x[0, 0, 0, 0]))

    out = jfn(variables, audios[0], codes[0])
    sync(out)
    for i in range(warmup):
        out = jfn(variables, audios[i % n_bufs], codes[i % n_bufs])
    sync(out)

    def timed(n):
        tic = time.perf_counter()
        o = out
        for i in range(n):
            o = jfn(variables, audios[i % n_bufs], codes[i % n_bufs])
        sync(o)
        return time.perf_counter() - tic

    # two run lengths; the slope cancels the fixed fetch/tunnel round-trip cost
    n1, n2 = iters, iters * 4
    t1, t2 = timed(n1), timed(n2)
    per_call = (t2 - t1) / (n2 - n1)
    num_frames = out.shape[1]
    return batch * num_frames / per_call, per_call


def bench_train_step_chunked(batch: int = 32, k: int = 32, dispatches: int = 4,
                             step_flops: float | None = None):
    """Pose2Pose train rate WITH dispatch amortization: K steps per device
    dispatch (TRAIN.STEPS_PER_DISPATCH — a lax.scan over on-device index
    gathers from the HBM-resident train cache, trainer.py).  The per-step
    pose2pose number is 88% host-dispatch overhead through the remote tunnel
    (docs/PERF.md "Pose2Pose train-step floor"); this measures the shipped
    fix end-to-end.  ``step_flops`` is the per-step FLOP count from the
    per-step bench's cost analysis (the scan's own cost model counts the body
    once, not ×K, so it can't be trusted here).  Returns
    (steps_per_sec, flops_per_step)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        n_train = max(256, batch)
        make_synthetic_speaker(tmp, "oliver", num_train=n_train, num_dev=0)
        cfg = get_cfg_defaults()
        cfg.merge_from_file(os.path.join(os.path.dirname(__file__),
                                         "configs", "pose2pose.yaml"))
        cfg.DATASET.ROOT_DIR = tmp
        cfg.DATASET.SPEAKER = "oliver"
        cfg.DATASET.CACHING = True
        cfg.TRAIN.BATCH_SIZE = batch
        cfg.TRAIN.PRECISION = "bf16"
        cfg.TRAIN.VALIDATE = False
        cfg.TRAIN.SAVE_VIDEO = False
        cfg.TRAIN.STEPS_PER_DISPATCH = k
        cfg.freeze()

        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        cache = pipe._chunk_cache_or_none(cfg)
        if cache is None:
            raise RuntimeError("device-resident train cache did not engage")

        pipe.train_dataloader.set_epoch(1)
        batches = pipe.train_dataloader.index_batches()
        idx = jnp.asarray(np.stack([batches[i % len(batches)]
                                    for i in range(k)]), dtype=jnp.int32)
        rng_sets = [jnp.stack([jax.random.PRNGKey(d * k + j)
                               for j in range(k)]) for d in range(4)]
        if "step" not in pipe.state:
            pipe.state["step"] = jnp.asarray(0, jnp.int32)
        scan_fn = pipe._get_train_scan(k)

        # two warm dispatches: the first pays compile, the second drains any
        # straggling async work so the timed slope starts clean
        state, losses = scan_fn(pipe.state, cache, idx, rng_sets[0])
        float(np.asarray(losses["loss"][-1]))  # completion fence
        state, losses = scan_fn(state, cache, idx, rng_sets[1])
        float(np.asarray(losses["loss"][-1]))

        def timed(n, state):
            tic = time.perf_counter()
            for i in range(n):
                state, losses = scan_fn(state, cache, idx, rng_sets[i % 4])
            float(np.asarray(losses["loss"][-1]))
            return time.perf_counter() - tic, state

        n1, n2 = dispatches, dispatches * 4
        t1, state = timed(n1, state)
        t2, state = timed(n2, state)
        if t2 > t1:
            return (n2 - n1) * k / (t2 - t1), step_flops
        # a transient host stall inflated the short window past the long one;
        # the long window alone is then the honest (slightly pessimistic) rate
        print(f"[bench] chunked slope degenerate (t1={t1:.3f}s >= t2={t2:.3f}s"
              f"); using the long window", file=sys.stderr, flush=True)
        return n2 * k / t2, step_flops


def bench_train_step(batch: int = 32, iters: int = 10, warmup: int = 2,
                     preset: str | None = None):
    """Full train step rate on synthetic data (steps/sec).

    ``preset``: None = flagship SDT-BP (bf16); otherwise a configs/ YAML name
    ('voice2pose_s2g.yaml' exercises the GAN step — D optimizer + the
    three-forward BN cadence; 'pose2pose.yaml' the VAE step with the in-jit
    code-bank scatter).  All four reference presets are first-class training
    configs (reference configs/*.yaml)."""
    import tempfile

    import jax
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_speaker(tmp, "oliver", num_train=batch, num_dev=0)
        if preset is None:
            cfg = _flagship_cfg()
        else:
            from speechdrivestemplates_tpu.config import get_cfg_defaults

            cfg = get_cfg_defaults()
            cfg.merge_from_file(os.path.join(os.path.dirname(__file__),
                                             "configs", preset))
            cfg.DATASET.SPEAKER = "oliver"
            cfg.TRAIN.PRECISION = "bf16"
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
        if cfg.PIPELINE_TYPE == "Pose2Pose":
            step_fn = pipe._get_step("train")
            fence_key = "loss"
        else:
            step_fn = pipe._get_train_step()
            fence_key = "G_loss"
        rngs = [jax.random.PRNGKey(i) for i in range(4)]

        # FLOP accounting for MFU: XLA's own cost model on the compiled step
        # (fwd + 3 grads + 3 optax updates + metrics).
        step_flops = None
        try:
            ca = step_fn.lower(pipe.state, dbs[0], rngs[0]).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            step_flops = float(ca.get("flops", 0.0)) or None
        except Exception as e:  # pragma: no cover - backend-dependent
            print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

        state = pipe.state
        for i in range(warmup):
            state, losses, _ = step_fn(state, dbs[i % len(dbs)], rngs[i % 4])
        float(np.asarray(losses[fence_key]))  # true completion fence (see sync above)

        def timed(n, state):
            tic = time.perf_counter()
            for i in range(n):
                state, losses, _ = step_fn(state, dbs[i % len(dbs)], rngs[i % 4])
            float(np.asarray(losses[fence_key]))
            return time.perf_counter() - tic, state

        n1, n2 = iters, iters * 4
        t1, state = timed(n1, state)
        t2, state = timed(n2, state)
        return (n2 - n1) / (t2 - t1), step_flops


def _emit(frames_per_sec: float, error: str | None = None):
    line = {
        "metric": "pose_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / 1000.0, 3),
    }
    if error:
        line["error"] = error
    print(json.dumps(line), flush=True)


def main():
    """Supervisor: run the actual bench in a SUBPROCESS and retry across
    device flaps.

    Why a subprocess: the 2026-08-18 outage killed a run MID-bench with a
    backend FailedPrecondition — after which the in-process JAX backend is
    poisoned (every later dispatch fails), so an in-process retry can never
    recover even once the tunnel does.  A child process gets a fresh backend
    per attempt, a timeout kills a wedged attempt without killing the
    supervisor, and the supervisor guarantees exactly one JSON line lands on
    stdout whatever happens inside."""
    import subprocess

    t0 = time.time()
    total_budget_s = float(os.environ.get("SDT_BENCH_BUDGET_S", "2100"))
    last_err = "no attempt ran"
    attempt = 0
    while True:
        remaining = total_budget_s - (time.time() - t0)
        if remaining < 180 or attempt >= 6:
            # attempt cap: a child that fails FAST (import error, bad install)
            # would otherwise respin for the whole 35-min budget
            _emit(0, error=f"gave up after {attempt} attempt(s); "
                           f"last: {last_err}")
            sys.exit(1)
        if not _wait_for_device(max_wait_s=min(420.0, remaining - 150.0)):
            # an honest failure line beats a silent hang: the driver records
            # SOMETHING, and the zero is unmistakably an outage, not a
            # regression
            _emit(0, error="device unreachable (execution probe); "
                           f"last: {last_err}")
            sys.exit(1)
        attempt += 1
        remaining = total_budget_s - (time.time() - t0)
        env = dict(os.environ,
                   SDT_BENCH_CHILD="1",
                   SDT_BENCH_BUDGET_S=str(max(120.0, remaining - 90.0)))
        print(f"[bench] attempt {attempt} ({remaining:.0f}s left in budget)",
              file=sys.stderr, flush=True)
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=max(150.0, remaining - 30.0))
        except subprocess.TimeoutExpired as e:
            sys.stderr.write((e.stderr or b"").decode("utf-8", "replace")
                             if isinstance(e.stderr, bytes) else (e.stderr or ""))
            last_err = f"attempt {attempt} exceeded its window"
            print(f"[bench] {last_err}; re-probing device", file=sys.stderr,
                  flush=True)
            continue
        sys.stderr.write(r.stderr or "")
        sys.stderr.flush()
        good = None
        for line in (r.stdout or "").splitlines():
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if (d.get("metric") == "pose_frames_per_sec_per_chip"
                    and d.get("value", 0) > 0):
                good = line
        if good is not None:
            print(good, flush=True)
            sys.exit(0)
        last_err = (f"attempt {attempt} rc={r.returncode} without a positive "
                    f"metric")
        print(f"[bench] {last_err}; re-probing device", file=sys.stderr,
              flush=True)


def _child_main():
    _enable_compile_cache()
    import threading

    # Global budget: the whole process must exit (0, with whatever JSON is
    # already on stdout) strictly inside the supervisor's per-attempt window —
    # round 3 died as an opaque rc=124 because its internal budgets summed
    # past the driver's.
    t0 = time.time()
    total_budget_s = float(os.environ.get("SDT_BENCH_BUDGET_S", "2100"))

    # If the tunnel dies MID-bench, fail loudly rather than hang forever.  A
    # cold remote compile can legitimately run past 20 min, and from inside
    # this process that is indistinguishable from a dead tunnel — so the first
    # firing extends once up to the global budget, and only the second firing
    # (global budget exhausted) emits the honest zero.
    state = {"watchdog": None, "extended": False, "done": False}

    def no_primary():
        if state["done"]:
            # bench_inference finished in the instant between this timer
            # firing and the main thread's cancel() — nothing is wedged
            return
        if not state["extended"]:
            state["extended"] = True
            remaining = total_budget_s - (time.time() - t0) - 60.0
            if remaining > 60.0:
                print(f"[bench] primary bench slow (cold compile or device "
                      f"loss); extending watchdog {remaining:.0f}s to the "
                      f"global budget", file=sys.stderr, flush=True)
                t = threading.Timer(remaining, no_primary)
                t.daemon = True
                t.start()
                state["watchdog"] = t
                return
        print("[bench] primary inference bench exceeded the global budget",
              file=sys.stderr, flush=True)
        _emit(0, error="bench exceeded budget (slow compile or device loss)")
        os._exit(1)

    primary_budget = min(1200.0, max(60.0, total_budget_s - (time.time() - t0) - 60.0))
    state["watchdog"] = threading.Timer(primary_budget, no_primary)
    state["watchdog"].daemon = True
    state["watchdog"].start()
    frames_per_sec, step_time = bench_inference()
    state["done"] = True  # before cancel: the timer may already be mid-fire
    state["watchdog"].cancel()
    print(f"[bench] inference: {frames_per_sec:.1f} pose-frames/s/chip "
          f"({step_time*1e3:.2f} ms / batch-128 fwd)", file=sys.stderr, flush=True)
    # Emit the primary metric NOW — a wedge in the auxiliary train benches
    # below can then never swallow the round's JSON artifact.
    _emit(frames_per_sec)

    # Guard the auxiliary train-step benches with a watchdog so a wedged
    # remote compile exits cleanly (the primary line is already on stdout).
    def bail():
        print("[bench] train-step bench timed out; primary metric already "
              "emitted", file=sys.stderr, flush=True)
        os._exit(0)

    aux_budget = max(30.0, total_budget_s - (time.time() - t0))
    watchdog = threading.Timer(aux_budget, bail)
    watchdog.daemon = True
    watchdog.start()
    peak = 197e12  # v5e bf16 peak TFLOP/s per chip (fp32 via bf16x3 is ~1/3)

    def report(label, sps, flops):
        print(f"[bench] train: {sps:.2f} steps/s (batch 32, {label})",
              file=sys.stderr, flush=True)
        if flops:
            mfu = flops * sps / peak
            print(f"[bench] {label} step = {flops/1e9:.2f} GFLOP "
                  f"(XLA cost model) -> MFU {mfu*100:.2f}% of v5e bf16 peak",
                  file=sys.stderr, flush=True)

    # the full pipeline matrix: flagship SDT-BP, the GAN preset (D optimizer +
    # BN cadence), and the Pose2Pose VAE (bank scatter) — all on the chip
    p2p_flops = None
    for label, preset in (("SDT-BP", None),
                          ("s2g-GAN", "voice2pose_s2g.yaml"),
                          ("pose2pose", "pose2pose.yaml")):
        try:
            sps, flops = bench_train_step(preset=preset)
            if label == "pose2pose":
                p2p_flops = flops
            report(label, sps, flops)
        except Exception as e:  # pragma: no cover
            print(f"[bench] {label} train bench failed: {e}", file=sys.stderr,
                  flush=True)
    # the dispatch-amortized pose2pose rate (TRAIN.STEPS_PER_DISPATCH=32) —
    # the shipped fix for the 6.1%-MFU dispatch-bound per-step number above
    try:
        sps, flops = bench_train_step_chunked(step_flops=p2p_flops)
        report("pose2pose, K=32 steps/dispatch", sps, flops)
    except Exception as e:  # pragma: no cover
        print(f"[bench] pose2pose chunked bench failed: {e}", file=sys.stderr,
              flush=True)
    watchdog.cancel()


if __name__ == "__main__":
    if os.environ.get("SDT_BENCH_CHILD"):
        _child_main()
    else:
        main()
