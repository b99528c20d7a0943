from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batched_quad_sharding,
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_points,
    shard_quad,
)
