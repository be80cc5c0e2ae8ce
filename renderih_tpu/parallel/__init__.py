"""SPMD parallelism: device mesh, sharding rules, ZeRO-1 optimizer sharding."""

from renderih_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    param_sharding_rules,
    zero1_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "param_sharding_rules",
    "zero1_sharding",
]
