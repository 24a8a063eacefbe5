from .mesh import (  # noqa: F401
    batch_sharding,
    device_put_batch,
    make_mesh,
    replicated,
    shard_params,
)
