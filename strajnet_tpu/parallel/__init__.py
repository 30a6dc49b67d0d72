from strajnet_tpu.parallel.mesh import (
    create_mesh,
    param_partition_spec,
    shard_batch,
    shard_params,
)

__all__ = ["create_mesh", "param_partition_spec", "shard_batch",
           "shard_params"]
