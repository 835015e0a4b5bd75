from .mesh import (batch_sharding, make_mesh, param_sharding_rules,
                   param_shardings, replicated, shard_params)
from .collectives import all_gather_batch, shard_map_loss_fn

__all__ = ["batch_sharding", "make_mesh", "param_sharding_rules",
           "param_shardings", "replicated", "shard_params",
           "all_gather_batch", "shard_map_loss_fn"]
