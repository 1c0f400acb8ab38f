from .mesh import (
    data_parallel_shardings,
    initialize_distributed,
    make_mesh,
    replicate,
    shard_batch,
)
