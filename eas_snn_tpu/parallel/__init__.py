from .mesh import (
    channel_shard_params,
    data_parallel_shardings,
    dp_tp_shardings,
    initialize_distributed,
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    spatial_sharding,
)
