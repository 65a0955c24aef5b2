from controllable_xgating_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_parallel_train_step,
    replicate_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_parallel_train_step",
    "replicate_sharding",
    "shard_batch",
]
