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
from .distributed import (
    ProcessInfo,
    ProcessShardedDataset,
    initialize_distributed,
    make_global_batch,
    mesh_process_info,
)
from .pipeline import pipeline_apply
from .transformer_pipeline import (
    pipeline_transformer_stack,
    stack_stage_params,
    transformer_stage_fn,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_MODEL",
    "ProcessInfo",
    "ProcessShardedDataset",
    "batch_sharding",
    "initialize_distributed",
    "make_global_batch",
    "make_mesh",
    "mesh_process_info",
    "param_shardings",
    "param_spec",
    "pipeline_apply",
    "pipeline_transformer_stack",
    "replicated",
    "stack_stage_params",
    "transformer_stage_fn",
    "shard_batch",
    "shard_params",
]
