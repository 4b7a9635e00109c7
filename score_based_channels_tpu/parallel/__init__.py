from .mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
