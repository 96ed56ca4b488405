from .fsdp import fsdp_shard_params, fsdp_sharding_tree
from .mesh import make_mesh, shard_batch, replicate
from .tp import tp_shard_params

__all__ = ["make_mesh", "shard_batch", "replicate", "tp_shard_params",
           "fsdp_shard_params", "fsdp_sharding_tree"]
