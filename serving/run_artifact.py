#!/usr/bin/env python
"""Standalone serving runner: wav -> poses from an exported StableHLO artifact.

Deliberately imports NOTHING from speechdrivestemplates_tpu — only jax, numpy
and the stdlib — to demonstrate that a serving host needs just the artifact
(`main.py --export`) and its .json sidecar.  Works on CPU or TPU (the default
export is lowered for both).

    python serving/run_artifact.py sdt_bp.stablehlo input.wav out.npz \
        [--code-seed 0] [--platform cpu]

The artifact's shapes are static: audio shorter than the exported length is
zero-padded, longer audio is cropped (export a longer serving point, or use
the framework's streaming/windowed paths for arbitrary lengths).
"""

from __future__ import annotations

import argparse
import json
import wave


def load_wav_16k(path: str):
    import numpy as np

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    if sr != 16000:
        # integer-factor polyphase-free resample via linear interpolation —
        # adequate for a demo runner; production should feed 16 kHz audio
        import numpy as np

        t = np.arange(int(len(data) * 16000 / sr)) * (sr / 16000.0)
        data = np.interp(t, np.arange(len(data)), data).astype(np.float32)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("wav")
    ap.add_argument("out", help="output npz (poses in pixel space)")
    ap.add_argument("--code-seed", type=int, default=0,
                    help="seed for the N(0,1) template code (code models only)")
    ap.add_argument("--platform", default=None,
                    help="pin the jax backend (e.g. 'cpu', 'tpu'); the "
                         "artifact must have been lowered for it. Without "
                         "this, jax picks — and a wedged remote accelerator "
                         "can block device enumeration indefinitely")
    ap.add_argument("--bench", type=int, default=0, metavar="ITERS",
                    help="after serving the wav, slope-time the artifact "
                         "over ITERS device-resident calls (two run lengths "
                         "cancel the fixed tunnel round-trip, as in "
                         "bench.py) and print a frames/s JSON line — the "
                         "zero-framework counterpart of the in-framework "
                         "throughput number")
    ap.add_argument("--bench-out", default=None, metavar="PATH",
                    help="also write the --bench JSON record to PATH")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    with open(args.artifact + ".json") as f:
        meta = json.load(f)
    with open(args.artifact, "rb") as f:
        fn = jax.export.deserialize(f.read()).call

    B, L = meta["batch_size"], meta["audio_length"]
    audio = load_wav_16k(args.wav)
    clipped = len(audio) > L
    buf = np.zeros((B, L), np.float32)
    buf[0, : min(len(audio), L)] = audio[:L]

    inputs = [jnp.asarray(buf)]
    if meta.get("code_dim"):
        key = jax.random.PRNGKey(args.code_seed)
        inputs.append(jax.random.normal(key, (B, meta["code_dim"]),
                                        jnp.float32))
    poses = np.asarray(fn(*inputs))[0]  # (T, 2, K)

    np.savez(args.out, poses=poses, fps=15,
             num_frames=meta["num_frames"], speaker=meta.get("speaker"))
    note = " (input clipped to the exported length)" if clipped else ""
    print(f"{poses.shape[0]} pose frames ({poses.shape[-1]} keypoints) "
          f"-> {args.out}{note}")

    if args.bench:
        import time

        # Device-resident throughput, methodology identical to bench.py's
        # in-framework number: several distinct pre-staged input buffers
        # (cycled, so no call can be deduped), scalar-fetch completion fence
        # (block_until_ready can ack at dispatch through remote tunnels),
        # and a two-run-length slope that cancels the fixed round-trip.
        rng = np.random.RandomState(0)
        n_bufs = 4
        audios = [jax.device_put(jnp.asarray(
            rng.randn(B, L).astype(np.float32) * 0.1)) for _ in range(n_bufs)]
        codes = [jax.device_put(jnp.asarray(
            rng.randn(B, meta["code_dim"]).astype(np.float32)))
            for _ in range(n_bufs)] if meta.get("code_dim") else None
        jfn = jax.jit(fn)

        def call(i):
            a = audios[i % n_bufs]
            return jfn(a, codes[i % n_bufs]) if codes else jfn(a)

        def fence(o):
            return float(np.asarray(o[(0,) * o.ndim]))

        out = call(0)
        fence(out)
        for i in range(5):
            out = call(i)
        fence(out)

        def timed(n):
            tic = time.perf_counter()
            o = out
            for i in range(n):
                o = call(i)
            fence(o)
            return time.perf_counter() - tic

        n1, n2 = args.bench, args.bench * 4
        t1, t2 = timed(n1), timed(n2)
        per_call = (t2 - t1) / (n2 - n1)
        frames_per_sec = B * meta["num_frames"] / per_call
        rec = {"metric": "served_frames_per_sec", "value": round(frames_per_sec, 1),
               "unit": "frames/s", "batch": B,
               "per_call_ms": round(per_call * 1e3, 3),
               "platforms": meta.get("platforms")}
        print(json.dumps(rec))
        if args.bench_out:
            with open(args.bench_out, "w") as f:
                json.dump(rec, f)


if __name__ == "__main__":
    main()
