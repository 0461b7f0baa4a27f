"""Standalone input-pipeline benchmark (round-2 verdict item 4).

Measures host-side loader throughput (items/s) for the native C++ path vs the
numpy fallback, across worker counts, against the device-side consumption
target (the bf16 train step consumes batch_size * steps/s items/s).

Usage:  python bench_loader.py [num_clips] [epochs]
Prints one human line per configuration + a summary JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def bench(num_clips: int = 128, epochs: int = 2):
    import numpy as np

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.gesture_dataset import (DataLoader,
                                                                    GestureDataset)
    from speechdrivestemplates_tpu.datasets.native_loader import native_available
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_speaker(tmp, "oliver", num_train=num_clips, num_dev=0)
        cfg = get_cfg_defaults()
        cfg.DATASET.ROOT_DIR = tmp
        cfg.DATASET.SPEAKER = "oliver"
        cfg.DATASET.CACHING = False  # measure the real IO+transform path
        cfg.freeze()

        ncpu = os.cpu_count() or 1
        worker_counts = sorted({0, 2, 4, min(8, ncpu * 2)})
        for disable_native in (False, True):
            os.environ.pop("SDT_DISABLE_NATIVE", None)
            if disable_native:
                os.environ["SDT_DISABLE_NATIVE"] = "1"
            path = "numpy" if disable_native else (
                "native" if native_available() else "numpy(no-lib)")
            ds = GestureDataset(tmp, "oliver", "train", cfg)
            for w in worker_counts:
                loader = DataLoader(ds, batch_size=32, shuffle=True,
                                    num_workers=w)
                # COLD epoch: first pass over the freshly written npz files
                # (includes real file IO + parse; the page cache is cold for
                # this process).  Only the first configuration per path sees
                # truly cold files — later ones ride the OS cache, so the
                # cold number is recorded once per path at w=min.
                tic = time.perf_counter()
                n = 0
                for b in loader:
                    n += len(b["clip_index"])
                cold_ips = n / (time.perf_counter() - tic)
                if f"{path}_cold" not in results:
                    results[f"{path}_cold"] = round(cold_ips, 1)
                    print(f"[bench_loader] {path:14s} workers={w} COLD epoch: "
                          f"{cold_ips:9.1f} items/s", file=sys.stderr,
                          flush=True)
                tic = time.perf_counter()
                n = 0
                for e in range(epochs):
                    loader.set_epoch(e)
                    for b in loader:
                        n += len(b["clip_index"])
                dt = time.perf_counter() - tic
                ips = n / dt
                results[f"{path}_w{w}"] = round(ips, 1)
                print(f"[bench_loader] {path:14s} workers={w}: {ips:9.1f} items/s",
                      file=sys.stderr, flush=True)
        os.environ.pop("SDT_DISABLE_NATIVE", None)

        # steady-state: CACHING=True epochs >=2 serve from the materialized
        # structure-of-arrays cache (one vectorized gather per key per batch)
        cfg2 = get_cfg_defaults()
        cfg2.DATASET.ROOT_DIR = tmp
        cfg2.DATASET.SPEAKER = "oliver"
        cfg2.DATASET.CACHING = True
        cfg2.freeze()
        ds = GestureDataset(tmp, "oliver", "train", cfg2)
        loader = DataLoader(ds, batch_size=32, shuffle=True, num_workers=0)
        for _ in loader:
            pass  # epoch 1 fills + promotes the cache
        tic = time.perf_counter()
        n = 0
        for e in range(4 * epochs):
            loader.set_epoch(e)
            for b in loader:
                n += len(b["clip_index"])
        ips = n / (time.perf_counter() - tic)
        results["cached_soa"] = round(ips, 1)
        print(f"[bench_loader] cached-SoA     workers=0: {ips:9.1f} items/s",
              file=sys.stderr, flush=True)

    results["host_cpus"] = ncpu
    # device-side consumption at the recorded bf16 train rates (BENCH_r03):
    # 107.8 steps/s * batch 32, and the high-MFU batch-128 point (33 steps/s)
    results["device_demand_b32_items_per_s"] = 107.8 * 32
    results["device_demand_b128_items_per_s"] = 33.0 * 128
    print(json.dumps({"metric": "loader_items_per_sec", **results}), flush=True)
    return results


if __name__ == "__main__":
    num_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    bench(num_clips, epochs)
