"""ZeRO-1 optimizer-state sharding over the ``data`` mesh axis.

The reference holds a full replica of the optimizer state on every GPU
(torch SGD/LARS momentum, `/root/reference/cvap/optimizer/__init__.py`);
at scale that replica is the largest fixed memory cost after activations
(Adam: 2× params in fp32). The TPU-native formulation shards each large
optimizer-state leaf over the ``data`` axis and lets GSPMD rewrite the
step's dataflow: the gradient all-reduce becomes a reduce-scatter into the
sharded moment update, and one all-gather rebuilds the (replicated) params
— the ZeRO-1 schedule (Rajbhandari et al., 2019) expressed as sharding
annotations instead of hand-written collectives.

Composes with the other axes: a leaf already sharded over ``model``
(Megatron MLP split) or ``pipe`` (stacked trunks) keeps those dims and
takes ``data`` on the first *free* divisible dim.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _with_data_axis(x: jax.Array, mesh: Mesh, min_size: int) -> jax.Array:
    if not isinstance(x, jax.Array) or x.ndim == 0 or x.size < min_size:
        return x
    dsize = int(mesh.shape["data"])
    spec = [None] * x.ndim
    if isinstance(x.sharding, NamedSharding):
        cur = list(x.sharding.spec)
        spec[: len(cur)] = cur
    for d in range(x.ndim):
        if spec[d] is None and x.shape[d] % dsize == 0:
            spec[d] = "data"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return x  # no free divisible dim — stays as placed


def zero_shard_opt_state(opt_state: Any, mesh: Mesh, min_size: int = 1 << 14) -> Any:
    """Re-place an optimizer state so every large leaf (Adam mu/nu, LARS
    momentum) is sharded 1/N over the ``data`` axis. Leaves keep any
    ``model``/``pipe`` dims they inherited from their param's placement
    (``tx.init`` zeros_like copies the param sharding); scalars (step
    counts) and small leaves stay replicated."""
    if int(mesh.shape["data"]) <= 1:
        return opt_state
    return jax.tree_util.tree_map(
        lambda x: _with_data_axis(x, mesh, min_size), opt_state
    )


def state_placement(state: Any) -> Any:
    """The sharding pytree of a placed state — the step-output constraint
    under ZeRO (without it GSPMD may float params toward the opt-state
    sharding, breaking donation round-trips)."""
    return jax.tree_util.tree_map(
        lambda x: x.sharding if isinstance(x, jax.Array) else None, state
    )


def constrain_to(placement: Any):
    """``constrain(state)`` pinning every leaf to ``placement`` inside jit.

    Flattens the placement ONCE (``None`` placements — non-array leaves —
    are kept as leaf slots, which plain tree_map would treat as empty
    subtrees and fail to line up against the state's array leaves)."""
    pl_leaves, treedef = jax.tree_util.tree_flatten(
        placement, is_leaf=lambda x: x is None
    )

    def constrain(state):
        x_leaves = treedef.flatten_up_to(state)
        out = [
            x if s is None else jax.lax.with_sharding_constraint(x, s)
            for x, s in zip(x_leaves, pl_leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, out)

    return constrain
