"""Worker for the 2-process sequence-parallel test: a 4-device mesh spanning
two processes runs ``generator_seq_parallel`` (time-axis shard_map with
ppermute halos + psum'd IN stats) and compares it against the process-local
dense forward.  Prints one JSON result line for the parent to assert on.

Usage: python _mp_seqpar_worker.py <coordinator> <process_id> <num_processes>
"""

import json
import os
import sys


def main():
    coordinator, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    n = jax.device_count()
    assert n == 2 * nproc, n

    import jax.numpy as jnp
    import numpy as np

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.models import build_model
    from speechdrivestemplates_tpu.parallel.mesh import get_data_mesh
    from speechdrivestemplates_tpu.parallel.seqparallel import \
        generator_seq_parallel

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.SPEAKER = "oliver"
    cfg.freeze()
    gen = build_model(cfg.VOICE2POSE.GENERATOR.NAME, cfg)

    # deterministic on BOTH processes: same seed -> same params/mel/code
    t_frames = 32 * n
    t_mel = 8 * n * ((t_frames * 160 * 4) // (160 * 8 * n) + 1)
    rng = np.random.RandomState(0)
    mel = (rng.randn(1, 80, t_mel) * 2).astype(np.float32)
    code = rng.randn(1, 32).astype(np.float32)
    variables = gen.init(jax.random.PRNGKey(0), jnp.asarray(mel), t_frames,
                         jnp.asarray(code), False)
    params = jax.device_get(variables["params"])

    mesh = get_data_mesh(n)  # spans both processes
    # compile-then-barrier (see _mp_worker.py: gloo's 30 s KV timeout vs
    # compile skew on a loaded 1-core host)
    from jax._src import distributed as _dist

    sp = np.asarray(generator_seq_parallel(
        mesh, params, mel, t_frames, code,
        leaky=cfg.VOICE2POSE.GENERATOR.LEAKY_RELU,
        norm=cfg.VOICE2POSE.GENERATOR.NORM))
    _dist.global_state.client.wait_at_barrier("sdt_seqpar_done", 600_000)

    dense = np.asarray(gen.apply({"params": params}, jnp.asarray(mel),
                                 t_frames, jnp.asarray(code), False))
    rel = float(np.max(np.abs(sp - dense)) / (np.max(np.abs(dense)) + 1e-8))

    print("MPRESULT " + json.dumps({
        "process": pid,
        "rel_err": rel,
        "checksum": float(np.float64(sp).sum()),
        "shape": list(sp.shape),
    }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
