from .mesh import make_mesh, shard_batch, replicate, data_sharding
from .spatial import spatial_shard_conv_apply, halo_exchange

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "spatial_shard_conv_apply", "halo_exchange"]
