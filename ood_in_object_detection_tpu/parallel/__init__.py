from .mesh import (  # noqa: F401
    batch_sharding,
    batch_spec,
    device_put_batch,
    make_mesh,
    make_multislice_mesh,
    num_slices,
    prefetch_to_device,
    replicated,
    shard_params,
)
