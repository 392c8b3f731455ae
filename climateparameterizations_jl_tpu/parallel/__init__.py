from climateparameterizations_jl_tpu.parallel.sharding import (
    make_mesh,
    shard_training_batch,
    replicate,
    make_sharded_nde_train_step,
    make_sharded_ensemble_solver,
    sharded_kernel_search,
)

__all__ = [
    "make_mesh",
    "shard_training_batch",
    "replicate",
    "make_sharded_nde_train_step",
    "make_sharded_ensemble_solver",
    "sharded_kernel_search",
]
