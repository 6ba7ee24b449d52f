from .mesh import (batch_sharding, make_mesh, param_partition_spec,
                   param_shardings, shard_params)

__all__ = ["make_mesh", "batch_sharding", "param_partition_spec",
           "param_shardings", "shard_params"]
