from climateparameterizations_jl_tpu.parallel.sharding import (
    make_mesh,
    shard_training_batch,
    replicate,
    make_sharded_nde_train_step,
    make_sharded_ensemble_solver,
    sharded_kernel_search,
)
from climateparameterizations_jl_tpu.parallel.les_sharding import (
    make_les_mesh,
    make_sharded_les_stepper,
    shard_les_state,
)

__all__ = [
    "make_mesh",
    "shard_training_batch",
    "replicate",
    "make_sharded_nde_train_step",
    "make_sharded_ensemble_solver",
    "sharded_kernel_search",
    "make_les_mesh",
    "make_sharded_les_stepper",
    "shard_les_state",
]
