from .mesh import make_mesh, data_sharding, replicated_sharding, \
    shard_batch
from .train_dp import make_dp_train_step

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_dp_train_step",
]
