"""Small shared SPMD shims (one home for JAX-version-sensitive surface).

Used by both the pipeline executor (parallel/pipeline.py) and the fused
attention kernel's mesh partitioning (ops/fused_attn.py).
"""

from __future__ import annotations


def smap(f, mesh, in_specs, out_specs):
    """`jax.shard_map` across JAX versions (kwarg names changed)."""
    try:
        from jax import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as sm2

        return sm2(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def is_manual(mesh) -> bool:
    """True inside a shard_map body (axes already mapped manually) — a
    nested shard_map over Manual axes is an error, so mesh-discovering ops
    must fall back to their per-device path there."""
    types = getattr(mesh, "axis_types", None)
    if types is None:
        return False
    vals = types.values() if hasattr(types, "values") else types
    return any("Manual" in str(t) for t in vals)
