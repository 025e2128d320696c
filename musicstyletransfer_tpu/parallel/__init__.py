from .mesh import (
    AXIS_DATA,
    AXIS_MODEL,
    batch_sharding,
    make_mesh,
    param_shardings,
    param_spec,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_MODEL",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "param_spec",
    "replicated",
    "shard_batch",
    "shard_params",
]
