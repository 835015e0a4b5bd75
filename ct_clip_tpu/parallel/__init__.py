from .mesh import (batch_sharding, fsdp_spec, make_mesh,
                   param_sharding_rules, param_shardings, replicated,
                   shard_opt_state, shard_params)
from .collectives import all_gather_batch, shard_map_loss_fn
from .multihost import (assemble_global_batch, is_main_process,
                        local_batch_size, shard_indices_for_process)

__all__ = ["batch_sharding", "fsdp_spec", "make_mesh",
           "param_sharding_rules", "param_shardings", "replicated",
           "shard_opt_state", "shard_params",
           "all_gather_batch", "shard_map_loss_fn",
           "assemble_global_batch", "is_main_process", "local_batch_size",
           "shard_indices_for_process"]
