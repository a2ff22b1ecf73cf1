from .fsdp import fsdp_spec, init_sharded, shard_state, state_shardings
from .mesh import (make_mesh, shard_batch, replicate, data_sharding,
                   init_distributed)
from .spatial import spatial_shard_conv_apply, halo_exchange

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "init_distributed", "spatial_shard_conv_apply", "halo_exchange",
           "fsdp_spec", "state_shardings", "shard_state", "init_sharded"]
