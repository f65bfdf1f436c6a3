"""SPMD parallelism: mesh, sharding, gradient cache, pipeline, sequence."""

from .grad_cache import grad_cache_value_and_grad
from .sequence import ring_attention, seq_context, seq_mesh_info
from .pipeline import (
    adapt_trunk_layout,
    gpipe,
    pipe_mesh_info,
    stack_block_tree,
    unstack_block_tree,
    unstack_in_tree,
)
from .mesh import (
    attn_heads_map,
    batch_sharding,
    data_shard_info,
    distributed_init,
    make_mesh,
    param_shardings,
    replicate,
    replicated,
    shard_batch,
    shard_params,
)
from .zero import constrain_to, state_placement, zero_shard_opt_state

__all__ = [
    "adapt_trunk_layout",
    "attn_heads_map",
    "batch_sharding",
    "constrain_to",
    "data_shard_info",
    "distributed_init",
    "gpipe",
    "grad_cache_value_and_grad",
    "make_mesh",
    "param_shardings",
    "pipe_mesh_info",
    "replicate",
    "replicated",
    "ring_attention",
    "seq_context",
    "seq_mesh_info",
    "shard_batch",
    "shard_params",
    "stack_block_tree",
    "state_placement",
    "unstack_block_tree",
    "unstack_in_tree",
    "zero_shard_opt_state",
]
