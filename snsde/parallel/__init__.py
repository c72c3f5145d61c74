from .mesh import (
    batch_sharding,
    init_multihost,
    local_device_count,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
