"""Device mesh and sharding helpers.

The reference's distribution stack is NCCL DDP: mp.spawn one process per GPU,
DistributedSampler to shard data, implicit gradient all-reduce, and explicit
``dist.reduce`` of loss dicts (reference main.py:53-58, trainer.py:71,323-327).

TPU-native replacement: ONE jitted train step over a 1-D ``Mesh('data')``.  Batches
are placed with a NamedSharding that splits the leading axis across the mesh; XLA
inserts the gradient all-reduce over ICI automatically because parameters are
replicated while activations are batch-sharded.  Metrics come out replicated (they are
means over the global batch), so no reduce_tensor_dict is needed.  Multi-host runs
initialize jax.distributed and shard data per process with the same code path (the
loader's num_shards/shard_index replace DistributedSampler).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_master_process() -> bool:
    return jax.process_index() == 0


@functools.lru_cache(maxsize=4)
def get_data_mesh(num_devices: int = -1, devices: Optional[tuple] = None) -> Mesh:
    """A 1-D data-parallel mesh over all (or the first ``num_devices``) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a pytree of host arrays with the leading axis split over 'data'.

    Single-process: a plain sharded device_put.  Multi-process: each process
    passes its LOCAL loader shard (the DataLoader already partitions clips by
    process, replacing DistributedSampler) and the shards are assembled into
    one global array per leaf — the jax.Array analog of DDP's
    per-rank batches.

    Non-array leaves (e.g. the speaker-name list) must be stripped before calling.
    """
    sh = batch_sharding(mesh)
    nproc = jax.process_count()
    n_local = max(1, mesh.size // nproc)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_local != 0:
            raise ValueError(
                f"per-process batch axis ({x.shape[0]}) must divide the local "
                f"device count ({n_local}); set TRAIN/TEST.BATCH_SIZE to a "
                f"multiple of the global device count or shrink the mesh with "
                f"SYS.MESH.DATA")
        if nproc > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def pad_eval_batch(mesh: Mesh, batch: Any):
    """Pad an eval batch's leading axis up to the mesh's device multiple.

    Eval loaders have no ``drop_last`` (reference semantics: ANY val-split
    size evaluates, reference trainer.py:104-123), so the last batch can be
    ragged while ``shard_batch`` requires the local batch to divide the local
    device count.  Pad rows are edge-repeats of the final sample; their
    contribution is sliced away INSIDE the jitted eval step via the returned
    global ``valid`` row indices, so every loss/metric is computed on exactly
    the true rows (no mask plumbing, and sharper than the reference, whose
    ragged-batch loss accumulation is biased by ``* TEST.BATCH_SIZE``).

    Returns ``(padded_batch, valid, sig)``: ``valid`` is the np.int32 array of
    global row indices holding real samples (None when no padding needed),
    and ``sig`` a small hashable tuple identifying the pad geometry for jit
    cache keys.  Multi-process: every process must hold the same local batch
    size (the DataLoader's shard padding guarantees it) and the global array
    is the process-order concatenation of local shards, so the valid rows are
    a strided pattern, not a prefix.
    """
    nproc = jax.process_count()
    n_local = max(1, mesh.size // nproc)
    leaves = jax.tree.leaves(batch)
    assert leaves, "empty eval batch"
    B = int(np.asarray(leaves[0]).shape[0])
    pad = (-B) % n_local
    if pad == 0:
        return batch, None, None

    def pad_leaf(x):
        x = np.asarray(x)
        return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)

    padded = jax.tree.map(pad_leaf, batch)
    per = B + pad
    valid = np.concatenate(
        [p * per + np.arange(B) for p in range(nproc)]).astype(np.int32)
    return padded, valid, (B, pad, nproc)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree fully replicated across the mesh (every process passes
    the same host values; multi-process assembly via make_array_from_callback).

    Single-process this is ONE ``jax.device_put`` over the whole tree, not a
    per-leaf map: on a remote-dispatch backend each put is a round-trip, and
    a few hundred parameter tensors uploaded one by one cost minutes of pure
    latency.  Leaves already committed to the target sharding pass through
    untouched, so re-replicating a partially host-mutated state only moves
    the mutated leaves."""
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    def put(x):
        if isinstance(x, jax.Array) and getattr(x, "sharding", None) == sh:
            return x
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def device_init(mesh: Mesh, fn, *args) -> Any:
    """Build an initial state pytree ON the devices as one jitted program.

    Eager module/optimizer init on a remote-dispatch backend issues one
    device call per parameter tensor (latency-bound through a tunnel, minutes
    for a few hundred leaves); jitting the whole init collapses it into a
    single dispatch.  ``out_shardings`` pins every leaf to the replicated
    NamedSharding that the train step's outputs carry, so the second train
    dispatch sees avals identical to the first and the program is never
    retraced/recompiled (a bare ``jnp.zeros`` leaf differs from the step's
    output aval and silently doubles every stage's compile cost).

    The PRNG keys (or any other non-static inputs) must come in through
    ``*args``, NOT closure captures: a zero-argument program is one big
    compile-time constant and XLA's constant folder will evaluate the entire
    init inside the compiler (minutes), instead of on the accelerator."""
    return jax.jit(fn, out_shardings=replicated_sharding(mesh))(*args)
