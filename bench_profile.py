"""Component-level step profiler: where does the time go on this chip?

The axon remote-compile backend cannot capture server-side XLA traces, so the
framework's profiling story on such backends is cumulative-subgraph bisection:
jit a nested prefix of the computation, slope-time it (two run lengths cancel
the fixed host/tunnel round-trip), and difference consecutive prefixes.  This
is the committed, reproducible form of the methodology behind the numbers in
docs/STATUS_r2.md ("Serving-path kernel work").

Usage:  python bench_profile.py [--batch 128] [--train-batch 32]
Prints a per-component table for the serving forward and the train step.
(Run with the chip otherwise idle — see bench.py's methodology note.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time



def _slope_time(fn, args, iters=20):
    """Seconds per call, fixed costs cancelled; fetches one output element as
    the completion fence (block_until_ready can ack at dispatch through
    remote-device tunnels)."""
    def fence(o):
        while isinstance(o, (tuple, list, dict)):
            o = (list(o.values()) if isinstance(o, dict) else list(o))[0]
        # device-side slice FIRST: fetching the full array through a remote
        # tunnel costs seconds of high-variance transfer and swamps the slope
        return float(o[(0,) * o.ndim])

    out = fn(*args)
    fence(out)
    for _ in range(3):
        out = fn(*args)
    fence(out)

    def run(n):
        tic = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        fence(o)
        return time.perf_counter() - tic

    t1, t2 = run(iters), run(iters * 4)
    return (t2 - t1) / (iters * 3)


def profile_serving(batch: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.ops.mel import mel_spectrogram

    cfg = _flagship_cfg()
    cfg.freeze()
    gen = build_model(cfg.VOICE2POSE.GENERATOR.NAME, cfg)

    audio_len, T = 68266, 64
    t_mel = audio_len // 160 + 1
    key = jax.random.PRNGKey(0)
    variables = gen.init(key, jnp.zeros((1, 80, t_mel)), T, jnp.zeros((1, 32)),
                         False)
    audio = jax.device_put(jax.random.normal(key, (batch, audio_len)) * 0.1)
    code = jax.device_put(jax.random.normal(key, (batch, 32)))

    # cumulative prefixes of the forward
    mel_only = jax.jit(lambda a: mel_spectrogram(a, impl="auto"))
    full = jax.jit(lambda v, a, c: gen.apply(
        v, mel_spectrogram(a, impl="auto"), T, c, False))

    t_mel_ms = _slope_time(mel_only, (audio,)) * 1e3
    t_full_ms = _slope_time(full, (variables, audio, code)) * 1e3

    # per-impl mel comparison
    rows = [("mel frontend (auto)", t_mel_ms),
            ("generator (full - mel)", t_full_ms - t_mel_ms),
            ("full forward", t_full_ms)]
    print(f"\n== serving forward, batch {batch} ==")
    for name, ms in rows:
        frames = batch * T / (t_full_ms / 1e3) if name == "full forward" else None
        extra = f"   -> {frames:,.0f} pose-frames/s" if frames else ""
        print(f"  {name:<28} {ms:8.3f} ms{extra}")

    print(f"  -- mel impl sweep (batch {batch}) --")
    for impl in ("dft2", "dft", "conv", "rfft"):
        try:
            f = jax.jit(lambda a, impl=impl: mel_spectrogram(a, impl=impl))
            print(f"  {('mel impl=' + impl):<28} "
                  f"{_slope_time(f, (audio,)) * 1e3:8.3f} ms")
        except Exception as e:
            print(f"  mel impl={impl}: unavailable ({type(e).__name__})")
    return t_full_ms


def _cost(compiled_or_jit, *args):
    """(flops, bytes_accessed) from XLA's cost model; (0, 0) if unavailable."""
    try:
        ca = compiled_or_jit.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def profile_train_phases(batch: int):
    """Train-step speed-of-light bisect (the train analog of PERF.md's
    serving floor analysis): forward / forward+backward / full step, each
    slope-timed with XLA cost-model FLOPs + HBM bytes, and a composite
    roofline floor  max(flops/peak_flops, bytes/peak_bw)  per phase.

    The floor is optimistic (assumes perfect compute/memory overlap and
    whole-step aggregation), so measured/floor is an upper bound on headroom."""
    import tempfile

    import jax

    from __graft_entry__ import _flagship_cfg
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.ops.mel import mel_spectrogram
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    PEAK_FLOPS = 197e12  # v5e bf16
    PEAK_BW = 819e9      # v5e HBM bytes/s

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_speaker(tmp, "oliver", num_train=batch, num_dev=0)
        cfg = _flagship_cfg()
        cfg.DATASET.ROOT_DIR = tmp
        cfg.TRAIN.BATCH_SIZE = batch
        cfg.TRAIN.VALIDATE = False
        cfg.TRAIN.SAVE_VIDEO = False
        if os.environ.get("SDT_CONV_MM_GRAD") == "1":
            # A/B the patches-matmul conv formulation (SYS.CONV_MM_GRAD)
            cfg.SYS.CONV_MM_GRAD = True
            print("  [CONV_MM_GRAD=1: patches-matmul stem convs]")
        cfg.freeze()
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        db = pipe._device_batch(next(iter(pipe.train_dataloader)))
        rng = jax.random.PRNGKey(0)
        state = pipe.state
        nf = cfg.DATASET.NUM_FRAMES
        mel_impl = cfg.SYS.MEL_IMPL

        # phase 1: generator forward only (the serving stem under train=True)
        def fwd(state, batch):
            mel = mel_spectrogram(batch["audio"], impl=mel_impl)
            code = state["clips_code"][batch["clip_index"]]
            pred, _ = pipe._apply_generator(
                state["params_g"], state["batch_stats_g"], mel, nf, code, True)
            return pred

        # phase 2: full G loss (incl. frozen FGD features) + grads for
        # G/code — the backward sweep, no optimizer updates
        def fwd_bwd(state, batch):
            def loss_fn(params_g, clips_code):
                mel = mel_spectrogram(batch["audio"], impl=mel_impl)
                code = clips_code[batch["clip_index"]]
                pred, _ = pipe._apply_generator(
                    params_g, state["batch_stats_g"], mel, nf, code, True)
                g_loss, _ = pipe._generator_losses(pred, batch["poses"], code,
                                                   None, True)
                return g_loss
            return jax.grad(loss_fn, argnums=(0, 1))(state["params_g"],
                                                     state["clips_code"])

        jfwd = jax.jit(fwd)
        jbwd = jax.jit(fwd_bwd)
        step_fn = pipe._get_train_step()

        t_fwd = _slope_time(jfwd, (state, db)) * 1e3
        t_bwd = _slope_time(jbwd, (state, db)) * 1e3

        def chained(n):
            nonlocal state
            tic = time.perf_counter()
            for _ in range(n):
                state, losses, _ = step_fn(state, db, rng)
            float(losses["G_loss"])
            return time.perf_counter() - tic

        state, losses, _ = step_fn(state, db, rng)
        float(losses["G_loss"])
        chained(8)
        t1, t2 = chained(8), chained(32)
        t_step = (t2 - t1) / 24 * 1e3

        rows = [("G forward (train mode)", t_fwd, _cost(jfwd, state, db)),
                ("G fwd+bwd (G+code grads)", t_bwd, _cost(jbwd, state, db)),
                ("full step (3 opts+metrics)", t_step,
                 _cost(step_fn, state, db, rng))]
        print(f"\n== train-step floor analysis, batch {batch} "
              f"(peak {PEAK_FLOPS/1e12:.0f} TFLOP/s bf16, "
              f"{PEAK_BW/1e9:.0f} GB/s HBM) ==")
        print(f"  {'phase':<28} {'ms':>8} {'GFLOP':>9} {'GB':>7} "
              f"{'MFU%':>6} {'floor ms':>9} {'x floor':>8}")
        for name, ms, (flops, bts) in rows:
            floor = max(flops / PEAK_FLOPS, bts / PEAK_BW) * 1e3
            mfu = flops / (ms / 1e3) / PEAK_FLOPS * 100 if ms else 0.0
            ratio = ms / floor if floor else float("nan")
            print(f"  {name:<28} {ms:8.3f} {flops/1e9:9.2f} {bts/1e9:7.2f} "
                  f"{mfu:6.1f} {floor:9.3f} {ratio:8.2f}")
        return rows


def profile_train_phases_p2p(batch: int):
    """Pose2Pose train-step floor analysis (PERF.md round-5 ask: is 544
    steps/s at 6.1% MFU dispatch-bound, HBM-bound, or leaving throughput on
    the table?).  Measures, on the chip:

      - the composite roofline floor per phase (as the SDT-BP analysis),
      - the host DISPATCH floor: back-to-back calls of a trivial jitted op,
        fenced once — the per-call cost of just feeding the device through
        the tunnel, which a 22-GFLOP step cannot amortize, and
      - the scan-of-K chained step: K full train steps inside ONE dispatch
        (lax.scan over the unjitted step body), giving the device-only step
        time with dispatch amortized — the measured upper bound on any
        STEPS_PER_DISPATCH-style batching.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    PEAK_FLOPS = 197e12
    PEAK_BW = 819e9

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_speaker(tmp, "oliver", num_train=batch, num_dev=0)
        cfg = get_cfg_defaults()
        cfg.merge_from_file(os.path.join(os.path.dirname(__file__),
                                         "configs", "pose2pose.yaml"))
        cfg.DATASET.ROOT_DIR = tmp
        cfg.DATASET.SPEAKER = "oliver"
        cfg.TRAIN.BATCH_SIZE = batch
        cfg.TRAIN.PRECISION = "bf16"
        cfg.TRAIN.VALIDATE = False
        cfg.TRAIN.SAVE_VIDEO = False
        cfg.freeze()
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        db = pipe._device_batch(next(iter(pipe.train_dataloader)))
        rng = jax.random.PRNGKey(0)
        nf = cfg.DATASET.NUM_FRAMES

        # phase 1: AE forward (encode + reparam + decode)
        def fwd(state, batch, rng):
            (pred, mu, logvar), _ = pipe._apply_ae(
                state["params_ae"], state["batch_stats_ae"], batch["poses"],
                nf, None, rng, True)
            return pred

        # phase 2: loss + grads, no optimizer
        def fwd_bwd(state, batch, rng):
            def loss_fn(params):
                (pred, mu, logvar), _ = pipe._apply_ae(
                    params, state["batch_stats_ae"], batch["poses"], nf,
                    None, rng, True)
                return pipe._losses(pred, batch["poses"], mu, logvar)["loss"]
            return jax.grad(loss_fn)(state["params_ae"])

        jfwd = jax.jit(fwd)
        jbwd = jax.jit(fwd_bwd)
        step_fn = pipe._get_step("train")
        state = pipe.state

        t_fwd = _slope_time(jfwd, (state, db, rng)) * 1e3
        t_bwd = _slope_time(jbwd, (state, db, rng)) * 1e3

        def chained(n, state):
            tic = time.perf_counter()
            for _ in range(n):
                state, losses, _ = step_fn(state, db, rng)
            float(losses["loss"])
            return time.perf_counter() - tic, state

        state, losses, _ = step_fn(state, db, rng)
        float(losses["loss"])
        _, state = chained(8, state)
        t1d, state = chained(16, state)
        t2d, state = chained(64, state)
        t_step = (t2d - t1d) / 48 * 1e3

        rows = [("AE forward (train mode)", t_fwd, _cost(jfwd, state, db, rng)),
                ("AE fwd+bwd (grads)", t_bwd, _cost(jbwd, state, db, rng)),
                ("full step (opt+bank+metrics)", t_step,
                 _cost(step_fn, state, db, rng))]
        print(f"\n== pose2pose train-step floor analysis, batch {batch} "
              f"(peak {PEAK_FLOPS/1e12:.0f} TFLOP/s bf16, "
              f"{PEAK_BW/1e9:.0f} GB/s HBM) ==")
        print(f"  {'phase':<30} {'ms':>8} {'GFLOP':>9} {'GB':>7} "
              f"{'MFU%':>6} {'floor ms':>9} {'x floor':>8}")
        for name, ms, (flops, bts) in rows:
            floor = max(flops / PEAK_FLOPS, bts / PEAK_BW) * 1e3
            mfu = flops / (ms / 1e3) / PEAK_FLOPS * 100 if ms else 0.0
            ratio = ms / floor if floor else float("nan")
            print(f"  {name:<30} {ms:8.3f} {flops/1e9:9.2f} {bts/1e9:7.2f} "
                  f"{mfu:6.1f} {floor:9.3f} {ratio:8.2f}")

        # host dispatch floor: trivial op, back-to-back, fenced once
        tiny = jax.jit(lambda x: x + 1.0)
        z = jax.device_put(jnp.zeros((8, 128)))
        tiny(z).block_until_ready()

        def disp(n):
            tic = time.perf_counter()
            o = z
            for _ in range(n):
                o = tiny(o)
            float(o[0, 0])
            return time.perf_counter() - tic

        disp(32)  # drain any enqueued work + absorb the first-fence cost
        d1, d2 = disp(64), disp(256)
        t_disp = (d2 - d1) / 192 * 1e3
        print(f"  {'dispatch floor (trivial op)':<30} {t_disp:8.3f}")

        # scan-of-K: K full steps in ONE dispatch -> device-only step time
        raw_step = getattr(step_fn, "__wrapped__", None)
        if raw_step is not None:
            K = 32

            def k_steps(state, batch, rngs):
                def body(s, r):
                    new_s, losses, _ = raw_step(s, batch, r)
                    return new_s, losses["loss"]
                return jax.lax.scan(body, state, rngs)

            jk = jax.jit(k_steps)
            rngs = jax.random.split(rng, K)
            t_scan = _slope_time(jk, (state, db, rngs)) * 1e3 / K
            print(f"  {'scan-of-%d chained steps' % K:<30} {t_scan:8.3f}"
                  f"   (device-only step, dispatch amortized)")
            flops_step = _cost(step_fn, state, db, rng)[0]
            if flops_step and t_scan:
                print(f"  -> amortized MFU "
                      f"{flops_step / (t_scan/1e3) / PEAK_FLOPS * 100:.1f}%; "
                      f"per-step dispatch overhead "
                      f"{max(0.0, t_step - t_scan):.3f} ms "
                      f"({max(0.0, t_step - t_scan) / t_step * 100:.0f}% of "
                      f"the measured step)")
        else:
            print("  (scan-of-K unavailable: jitted step has no __wrapped__)")


def profile_p2p_chunked(batch: int, k: int):
    """End-to-end steps/s of the REAL chunked trainer path — the shipped fix
    for the dispatch-bound pose2pose step (TRAIN.STEPS_PER_DISPATCH=K scanning
    over the device-resident train cache; config.py, trainer.py) — measured
    on the production-scale fixture (1024 clips, same as bench_e2e).  The
    --p2p-floor scan-of-K number is the device-only upper bound; this one
    includes the host chunk scheduling, index uploads, and epoch turnover."""
    import tempfile

    import jax

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        n_train = max(1024, batch)
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
        cfg.TRAIN.SAVE_NPZ = False
        cfg.TRAIN.STEPS_PER_DISPATCH = k
        cfg.freeze()
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        cache = pipe._chunk_cache_or_none(cfg)
        assert cache is not None, "device cache must engage for the chunked path"

        spe = len(pipe.train_dataloader)
        pipe.step_tic = time.time()
        pipe.train_dataloader.set_epoch(1)  # warm epoch: compiles K + remainder
        gs = pipe._train_epoch_chunked(cfg, 1, 0, cache)

        walls = []
        for e in (2, 3, 4):
            pipe.train_dataloader.set_epoch(e)
            jax.block_until_ready(pipe.state["params_ae"])
            tic = time.perf_counter()
            gs = pipe._train_epoch_chunked(cfg, e, gs, cache)
            jax.block_until_ready(pipe.state["params_ae"])
            walls.append(time.perf_counter() - tic)
        best = min(walls)
        print(f"\n== pose2pose chunked dispatch, K={k}, batch {batch}, "
              f"{spe} steps/epoch ==")
        print(f"  epoch walls: {', '.join('%.3f s' % w for w in walls)}")
        print(f"  {spe / best:,.1f} steps/s end-to-end "
              f"({best / spe * 1e3:.3f} ms/step incl. host scheduling)")


def profile_train(batch: int):
    import tempfile

    import jax

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
        if os.environ.get("SDT_CONV_MM_GRAD") == "1":
            # A/B the patches-matmul conv formulation (SYS.CONV_MM_GRAD)
            cfg.SYS.CONV_MM_GRAD = True
            print("  [CONV_MM_GRAD=1: patches-matmul stem convs]")
        cfg.freeze()
        pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
        pipe.setup_dataset(cfg, "train")
        pipe.setup_model(cfg)
        pipe.setup_optimizer()
        db = pipe._device_batch(next(iter(pipe.train_dataloader)))
        rng = jax.random.PRNGKey(0)
        step_fn = pipe._get_train_step()

        # the state arg is donated, so successive timed calls chain states
        state = pipe.state

        def chained(n):
            nonlocal state
            tic = time.perf_counter()
            for i in range(n):
                state, losses, _ = step_fn(state, db, rng)
            float(losses["G_loss"])
            return time.perf_counter() - tic

        state, losses, _ = step_fn(state, db, rng)  # compile + warm
        float(losses["G_loss"])
        chained(10)  # throwaway: absorbs donation-signature recompiles
        t1, t2 = chained(10), chained(40)
        t_ms = (t2 - t1) / 30 * 1e3
        print(f"\n== train step, batch {batch} ==")
        print(f"  full step                    {t_ms:8.3f} ms"
              f"   -> {1e3 / t_ms:.1f} steps/s")
        try:
            ca = step_fn.lower(state, db, rng).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            if flops:
                print(f"  XLA cost model               {flops/1e9:8.2f} GFLOP"
                      f"   -> MFU {flops / (t_ms/1e3) / 197e12 * 100:.1f}% "
                      "of v5e bf16 peak")
        except Exception as e:
            print(f"  cost_analysis unavailable: {e}")


def profile_shift_probe(n_planes: int = 128, C: int = 128):
    """Measure the cost structure that killed the round-2 fused stem kernel
    (probes/stem_pallas.py): per-tap sub-tile-offset VMEM slices.  Pallas
    variants of the same 9-tap conv-as-matmul workload on a (H*W, C) plane:

      aligned   all 9 tap reads at offset 0 (pure MXU + aligned-read floor)
      subtile   9 reads at sublane offsets 0..8 (the round-2 kernel's pattern)

    (Two shift-hoisting variants were tried and are unimplementable on this
    Mosaic version: pltpu.roll rejects bf16 ("Rotate with non-32-bit data"),
    and async_copy requires 8-sublane-aligned slice lengths, which a
    +-1-sublane shift by definition is not.)

    MEASURED (v5e, 2026-08-17): at C=128 subtile runs at ~89% of bf16 peak —
    sub-tile-offset window slices on a FLAT (M, C) buffer are essentially
    free, so the r2 postmortem's blamed cost does not reproduce in this
    layout; the r2 kernel's 15 ms came from its 4D mid-dim tap slices and
    64-lane buffers (at C=64 both variants collapse to ~16% of peak while
    XLA's tap-concatenated einsum holds 64%).  Design rule for stem v2:
    flatten (h, w) into the sublane axis and keep every buffer 128 lanes
    dense.  Numerical boundary handling is deliberately absent — cost probe
    only."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # W a multiple of 16 -> dy offsets tile-aligned; H kept small so the plane,
    # its two shifted copies, the fp32 accumulator, and Pallas's double-buffered
    # grid blocks all fit in 16 MB VMEM together.
    H, W = 20, 224
    M = H * W
    M_out = M - 2 * W

    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (n_planes, M, C), jnp.float32) * 0.1
         ).astype(jnp.bfloat16)
    w = (jax.random.normal(key, (9, C, C), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    x, w = jax.device_put(x), jax.device_put(w)

    def call(kernel, extra_scratch=()):
        return pl.pallas_call(
            kernel,
            grid=(n_planes,),
            in_specs=[pl.BlockSpec((1, M, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((9, C, C), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, M_out, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_planes, M_out, C), jnp.bfloat16),
            scratch_shapes=list(extra_scratch),
        )

    def k_aligned(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M_out, C), jnp.float32)
        for t in range(9):
            acc += jnp.dot(x_ref[0, :M_out, :], w_ref[t],
                           preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    def k_subtile(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M_out, C), jnp.float32)
        for t in range(9):
            acc += jnp.dot(x_ref[0, t:t + M_out, :], w_ref[t],
                           preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    variants = [
        ("aligned (floor)", call(k_aligned)),
        ("subtile (r2 pattern)", call(k_subtile)),
        ("xla 9-matmul", jax.jit(lambda x, w: jnp.einsum(
            "nmc,tcd->nmd", x[:, :M_out].astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))),
    ]
    gflop = 2.0 * n_planes * 9 * M_out * C * C / 1e9
    print(f"\n== tap-shift probe: {n_planes} planes of ({H}x{W}, {C}) bf16, "
          f"9 taps, {gflop:.0f} GFLOP ==")
    for name, fn in variants:
        try:
            jfn = jax.jit(fn)
            ms = _slope_time(jfn, (x, w)) * 1e3
            eff = gflop / ms / 197 * 100   # GFLOP/ms = TFLOP/s; v5e bf16 peak 197
            print(f"  {name:<22} {ms:8.3f} ms   {eff:5.1f}% of bf16 peak")
        except Exception as e:
            print(f"  {name:<22} FAILED: {type(e).__name__}: {e}")


def profile_conv1(batch: int = 128, width: int = 427):
    """Fused conv1+IN1 kernel (probes/conv1_pallas.py) vs the XLA lowering of
    the same segment, and the downstream layer-1 conv on both layouts (the
    kernel's padded output must not slow the consumer)."""
    import jax
    import jax.numpy as jnp

    from speechdrivestemplates_tpu.models.blocks import NORM_EPS
    from probes.conv1_pallas import fused_conv1_in

    key = jax.random.PRNGKey(0)
    mel = jax.device_put(jax.random.normal(key, (batch, 80, width)) * 0.1)
    w1 = jax.device_put(jax.random.normal(key, (3, 3, 1, 64)) * 0.2)
    w2 = jax.device_put(jax.random.normal(key, (4, 4, 64, 64)) * 0.05)

    def xla_layer(x, w, stride, pad, slope=0.2):
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=stride, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        m = jnp.mean(x, axis=(1, 2), keepdims=True)
        v = jnp.var(x, axis=(1, 2), keepdims=True)
        x = (x - m) * jax.lax.rsqrt(v + NORM_EPS)
        return jnp.where(x > 0, x, slope * x)

    bf = jnp.bfloat16
    sym, hvalid = [(1, 1), (1, 1)], [(0, 0), (1, 1)]
    cases = [
        ("xla conv1+IN1", jax.jit(
            lambda a: xla_layer(a[..., None].astype(bf), w1, (1, 1), sym))),
        ("pallas fused conv1+IN1", jax.jit(
            lambda a: fused_conv1_in(a, w1, dtype=bf))),
        ("xla seg1+layer1", jax.jit(
            lambda a: xla_layer(xla_layer(a[..., None].astype(bf), w1,
                                          (1, 1), sym), w2, (2, 2), sym))),
        ("pallas seg1+layer1", jax.jit(
            lambda a: xla_layer(fused_conv1_in(a, w1, dtype=bf), w2,
                                (2, 2), hvalid))),
    ]
    print(f"\n== conv1+IN1 segment, batch {batch}, width {width}, bf16 ==")
    for name, fn in cases:
        try:
            ms = _slope_time(fn, (mel,)) * 1e3
            print(f"  {name:<26} {ms:8.3f} ms")
        except Exception as e:
            print(f"  {name:<26} FAILED: {type(e).__name__}: {e}")

    # numerical check on hardware (bf16 grade)
    import numpy as np
    a = np.asarray(cases[2][1](mel), np.float32)
    b = np.asarray(cases[3][1](mel), np.float32)
    err = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-8)
    print(f"  rel err (xla vs pallas composition): {err:.2e}")


def conv_as_patches_matmul(x, w, stride, padding):
    """Lazy re-export of ops/patches_conv.py — the single implementation the
    model runs behind SYS.CONV_MM_GRAD, so the A/B probe measures exactly what
    the model would.  Lazy (like every jax import in this file) so importing
    bench_profile stays cheap."""
    from speechdrivestemplates_tpu.ops.patches_conv import (
        conv_as_patches_matmul as impl)

    return impl(x, w, stride, padding)


def profile_conv_bwd(batch: int = 128, width: int = 427):
    """A/B the stem's fwd+bwd cost: XLA convs vs the patches-matmul
    formulation, per layer and for the chained 3-layer stem (IN + lrelu
    between layers, loss = sum, grads w.r.t. all weights)."""
    import jax
    import jax.numpy as jnp

    from speechdrivestemplates_tpu.models.blocks import NORM_EPS

    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    mel = jax.device_put(jax.random.normal(key, (batch, 80, width, 1),
                                           dtype=jnp.float32) * 0.1)
    x64 = jax.device_put(jax.random.normal(key, (batch, 80, width, 64),
                                           dtype=jnp.float32) * 0.1)
    w1 = jax.device_put(jax.random.normal(key, (3, 3, 1, 64)) * 0.2)
    w2 = jax.device_put(jax.random.normal(key, (4, 4, 64, 64)) * 0.05)
    w3 = jax.device_put(jax.random.normal(key, (3, 3, 64, 128)) * 0.05)

    def xla_conv(x, w, stride, padding):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), stride, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def in_lrelu(x, slope=0.2):
        m = jnp.mean(x, axis=(1, 2), keepdims=True)
        v = jnp.var(x, axis=(1, 2), keepdims=True)
        x = (x - m) * jax.lax.rsqrt(v + NORM_EPS)
        return jnp.where(x > 0, x, slope * x)

    def layer(conv, x, w, stride, padding):
        return in_lrelu(conv(x.astype(bf), w, stride, padding))

    def stem(conv, ws, x):
        x = layer(conv, x, ws[0], (1, 1), [(1, 1), (1, 1)])
        x = layer(conv, x, ws[1], (2, 2), [(1, 1), (1, 1)])
        return layer(conv, x, ws[2], (1, 1), [(1, 1), (1, 1)])

    def fwd_bwd(f, ws, x):
        def loss(ws):
            return jnp.sum(f(ws, x).astype(jnp.float32))

        g = jax.grad(loss)(ws)
        return g

    cases = [
        ("conv2 k4s2 64->64   xla ", x64,
         lambda x: fwd_bwd(lambda ws, a: layer(xla_conv, a, ws[0], (2, 2),
                                               [(1, 1), (1, 1)]), (w2,), x)),
        ("conv2 k4s2 64->64   mm  ", x64,
         lambda x: fwd_bwd(lambda ws, a: layer(conv_as_patches_matmul, a,
                                               ws[0], (2, 2),
                                               [(1, 1), (1, 1)]), (w2,), x)),
        ("conv3 k3   64->128  xla ", x64,
         lambda x: fwd_bwd(lambda ws, a: layer(xla_conv, a, ws[0], (1, 1),
                                               [(1, 1), (1, 1)]), (w3,), x)),
        ("conv3 k3   64->128  mm  ", x64,
         lambda x: fwd_bwd(lambda ws, a: layer(conv_as_patches_matmul, a,
                                               ws[0], (1, 1),
                                               [(1, 1), (1, 1)]), (w3,), x)),
        ("stem 3-layer chain  xla ", mel,
         lambda x: fwd_bwd(lambda ws, a: stem(xla_conv, ws, a),
                           (w1, w2, w3), x)),
        ("stem 3-layer chain  mm  ", mel,
         lambda x: fwd_bwd(lambda ws, a: stem(conv_as_patches_matmul, ws, a),
                           (w1, w2, w3), x)),
        ("stem 3-layer mixed 1x,2m,3m", mel,
         lambda x: fwd_bwd(
             lambda ws, a: layer(
                 conv_as_patches_matmul,
                 layer(conv_as_patches_matmul,
                       layer(xla_conv, a, ws[0], (1, 1), [(1, 1), (1, 1)]),
                       ws[1], (2, 2), [(1, 1), (1, 1)]),
                 ws[2], (1, 1), [(1, 1), (1, 1)]),
             (w1, w2, w3), x)),
    ]
    print(f"\n== stem conv fwd+bwd, batch {batch}, width {width}, bf16 ==")
    for name, x, f in cases:
        try:
            jf = jax.jit(f)
            ms = _slope_time(jf, (x,)) * 1e3
            print(f"  {name:<30} {ms:8.3f} ms")
        except Exception as e:
            print(f"  {name:<30} FAILED: {type(e).__name__}: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128,
                    help="serving-forward batch (128 = v5e sweet spot)")
    ap.add_argument("--train-batch", type=int, default=32)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--train-floor", action="store_true",
                    help="train-step speed-of-light bisect (fwd / fwd+bwd / "
                         "full step vs the composite roofline floor)")
    ap.add_argument("--p2p-floor", action="store_true",
                    help="same for the Pose2Pose step, plus the host "
                         "dispatch floor and a scan-of-K chained-step "
                         "measurement (device-only step time)")
    ap.add_argument("--p2p-chunked", action="store_true",
                    help="end-to-end steps/s of the shipped chunked-dispatch "
                         "trainer path (TRAIN.STEPS_PER_DISPATCH)")
    ap.add_argument("--k", type=int, default=32,
                    help="steps per dispatch for --p2p-chunked")
    ap.add_argument("--shift-probe", action="store_true",
                    help="Pallas tap-shift cost probe (see profile_shift_probe)")
    ap.add_argument("--probe-c", type=int, default=128,
                    help="channel count for --shift-probe (64 = stem layers 1-2)")
    ap.add_argument("--conv1-probe", action="store_true",
                    help="fused conv1+IN1 kernel vs the XLA segment")
    ap.add_argument("--conv-bwd-probe", action="store_true",
                    help="stem fwd+bwd: XLA convs vs patches-matmul "
                         "formulation (matmul gradients)")
    args = ap.parse_args()

    import bench_common

    bench_common.enable_compile_cache()
    if args.shift_probe:
        profile_shift_probe(C=args.probe_c)
        return
    if args.conv1_probe:
        profile_conv1(args.batch)
        return
    if args.conv_bwd_probe:
        profile_conv_bwd(args.batch)
        return
    if args.train_floor:
        profile_train_phases(args.train_batch)
        return
    if args.p2p_floor:
        profile_train_phases_p2p(args.train_batch)
        return
    if args.p2p_chunked:
        profile_p2p_chunked(args.train_batch, args.k)
        return
    profile_serving(args.batch)
    if not args.skip_train:
        profile_train(args.train_batch)


if __name__ == "__main__":
    sys.exit(main())
