from .mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    param_partition_specs,
    shard_batch,
    shard_state,
    replicate,
    data_parallel_step,
    tensor_parallel_step,
)
