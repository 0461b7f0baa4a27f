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
    """Device-put a pytree of host arrays with the leading axis split over 'data'.

    Non-array leaves (e.g. the speaker-name list) must be stripped before calling.
    """
    sh = batch_sharding(mesh)
    n = mesh.size

    def put(x):
        if np.ndim(x) >= 1 and x.shape[0] % n != 0:
            raise ValueError(
                f"batch axis ({x.shape[0]}) must divide the data mesh size ({n}); "
                f"set TRAIN/TEST.BATCH_SIZE to a multiple of the device count or "
                f"shrink the mesh with SYS.MESH.DATA")
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
