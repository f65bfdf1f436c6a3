"""SPMD parallelism: mesh, sharding, gradient cache."""

from .grad_cache import grad_cache_value_and_grad
from .mesh import (
    batch_sharding,
    distributed_init,
    make_mesh,
    param_shardings,
    replicate,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "distributed_init",
    "grad_cache_value_and_grad",
    "make_mesh",
    "param_shardings",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_params",
]
