"""Worker process for the 2-process jax.distributed integration test.

Each worker is one 'host' of a 2-host CPU cluster (2 virtual devices each,
4 global).  It runs the real Voice2Pose pipeline path — per-process loader
shard -> global batch assembly -> jitted train step over the global mesh ->
collective orbax checkpoint -> restore -> one more step — and prints one JSON
line the parent asserts on (replicated losses/params must be identical across
processes; data shards must be disjoint).

Usage: python _mp_worker.py <coordinator> <process_id> <num_processes>
       <data_root> <out_dir>
"""

import json
import os
import sys


def main():
    coordinator, pid, nproc, data_root, out_dir = sys.argv[1:6]
    pid, nproc = int(pid), int(nproc)

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc, jax.device_count()

    import numpy as np

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = data_root
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = 4 * nproc  # 2 samples/device (KL var needs >1/batch)
    cfg.TRAIN.VALIDATE = False
    cfg.TRAIN.SAVE_VIDEO = False
    cfg.SYS.MESH.DATA = 2 * nproc
    cfg.freeze()

    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()

    seen = []
    step_fn = pipe._get_train_step()

    # Compile BEFORE the first collective executes, then rendezvous at a
    # coordinator barrier with a generous timeout.  Gloo's context init has a
    # hardcoded 30 s key-value timeout: without this barrier, whichever worker
    # finishes compiling first sits in gloo init while the other still
    # compiles, and on a loaded 1-core host that skew alone exceeds 30 s.
    first = next(iter(pipe.train_dataloader))
    step_fn.lower(pipe.state, pipe._device_batch(first),
                  jax.random.PRNGKey(0)).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("sdt_mp_compiled", 600_000)

    losses_log = []
    for i, batch in enumerate(pipe.train_dataloader):
        seen.extend(np.asarray(batch["clip_index"]).tolist())
        pipe.state, losses, _ = step_fn(pipe.state, pipe._device_batch(batch),
                                        jax.random.PRNGKey(i))
        losses_log.append({k: float(np.asarray(v)) for k, v in losses.items()})
        if i == 1:
            break

    # collective checkpoint save + restore
    pipe.base_path = out_dir
    pipe.save_checkpoint(epoch=1, global_step=2)
    params_before = float(sum(
        np.abs(np.asarray(x)).sum()
        for x in jax.tree.leaves(pipe.state["params_g"])))
    tree = pipe.load_checkpoint_tree(os.path.join(out_dir, "checkpoints"))
    pipe.load_state(tree["state"], load_optimizers=True)
    params_after = float(sum(
        np.abs(np.asarray(x)).sum()
        for x in jax.tree.leaves(pipe.state["params_g"])))

    # one more step from the restored state
    batch = next(iter(pipe.train_dataloader))
    pipe.state, losses3, _ = step_fn(pipe.state, pipe._device_batch(batch),
                                     jax.random.PRNGKey(99))

    # RAGGED eval across processes: each process passes 3 local rows on 2
    # local devices -> pad_eval_batch pads to 4 and the eval step gathers the
    # STRIDED global valid pattern [0,1,2, 4,5,6] (the multi-process branch
    # of the ragged-eval machinery); losses must be finite and identical
    # (replicated) across hosts
    from speechdrivestemplates_tpu.ops.mel import mel_frames_for_audio_length

    ragged = jax.tree.map(
        lambda v: np.asarray(v)[:3],
        {k: v for k, v in batch.items() if k in pipe._DEVICE_KEYS})
    rdb, rvalid, rsig = pipe._device_eval_batch(ragged)
    assert rvalid is not None and rsig == (3, 1, nproc), (rvalid, rsig)
    t_mel = mel_frames_for_audio_length(ragged["audio"].shape[-1])
    eval_fn = pipe._get_eval_step(cfg.DATASET.NUM_FRAMES, t_mel, rvalid, rsig)
    rlosses, _ = eval_fn(pipe.state, rdb, jax.random.PRNGKey(7), None)

    print("MPRESULT " + json.dumps({
        "process": pid,
        "seen": sorted(seen),
        "losses": losses_log,
        "params_l1_before": params_before,
        "params_l1_after_restore": params_after,
        "post_restore_G_loss": float(np.asarray(losses3["G_loss"])),
        "ragged_eval": {k: float(np.asarray(v)) for k, v in rlosses.items()},
    }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
