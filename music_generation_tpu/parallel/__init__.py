from .mesh import (batch_sharding, make_hybrid_mesh, make_mesh,
                   param_partition_spec, param_shardings, put_global_batch,
                   shard_params)

__all__ = ["make_mesh", "make_hybrid_mesh", "batch_sharding",
           "param_partition_spec", "param_shardings", "put_global_batch",
           "shard_params"]
