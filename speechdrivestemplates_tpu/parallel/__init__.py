from .mesh import (  # noqa: F401
    get_data_mesh,
    shard_batch,
    pad_eval_batch,
    replicate,
    device_init,
    process_count,
    process_index,
    is_master_process,
)
