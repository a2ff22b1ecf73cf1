from .mesh import (make_mesh, shard_batch, replicate, data_sharding,
                   init_distributed)
from .spatial import spatial_shard_conv_apply, halo_exchange

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "init_distributed", "spatial_shard_conv_apply", "halo_exchange"]
