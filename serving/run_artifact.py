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


if __name__ == "__main__":
    main()
