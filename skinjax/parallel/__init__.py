from skinjax.parallel.mesh import (
    batch_sharding,
    create_mesh,
    fsdp_sharding_rules,
    param_sharding_rules,
    replicated,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "fsdp_sharding_rules",
    "param_sharding_rules",
    "replicated",
    "shard_params",
]
