"""Pipeline parallelism (GPipe) over a ``pipe`` mesh axis.

The reference scales only by data parallelism (DP/DDP,
`/root/reference/train.py:17-35`); this module adds TPU-native *depth*
sharding beyond it: a transformer trunk whose per-layer parameters are
stacked on a leading ``[L, ...]`` axis is split into ``S = mesh.shape
['pipe']`` stages of ``L/S`` layers, and microbatches stream through the
stages over ICI ``ppermute`` — the standard SPMD collective-permute
pipelining pattern (one program, no per-stage processes).

Design notes:

- :func:`gpipe` is exact: the pipelined result (and its gradients, via AD
  through ``ppermute``/``psum``/``where``) equals sequential layer
  application; pinned in ``tests/test_pipeline.py``.
- Bubble: the schedule runs ``M + S - 1`` ticks for ``M`` microbatches, so
  ``(S-1)/(M+S-1)`` of stage-compute is warmup/drain waste (standard
  GPipe). Garbage bubble inputs are zero-initialised (LayerNorm/softmax of
  zeros are finite) and gated out of outputs with ``where``, so no NaNs
  can leak forward or backward.
- Composition: activations stay sharded over ``data`` (each data shard
  runs its own pipeline); stacked weights are sharded over ``pipe`` and
  replicated over ``model`` — pipe and tensor parallelism do NOT compose
  on the same trunk (a pipelined stage runs its attention kernels
  per-device, see ``ops/fused_attn._mesh_info`` Manual-mesh guard).
- Layout converters (:func:`stack_block_tree` / :func:`unstack_block_tree`
  / :func:`adapt_trunk_layout`) bridge the unrolled ``block_{i}`` param
  layout used by the checkpoint porters and the stacked ``blocks`` layout
  used by ``nn.layers.StackedTransformer``.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


from .spmd import is_manual as _is_manual, smap as _smap


def pipe_mesh_info(axis: str = "pipe"):
    """(mesh, pipe_size) when an ambient non-manual mesh carries a ``pipe``
    axis > 1; (None, 1) otherwise. Mirrors ``ops.fused_attn._mesh_info``."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:  # noqa: BLE001 - jax version surface
        return None, 1
    if mesh is None or getattr(mesh, "empty", True) or _is_manual(mesh):
        return None, 1
    if axis not in mesh.axis_names:
        return None, 1
    s = int(mesh.shape[axis])
    return (mesh, s) if s > 1 else (None, 1)


def _default_microbatches(b_loc: int, s: int) -> int:
    """Prefer 2·S microbatches (bubble (S-1)/(3S-1) ≈ 1/3 halved), else S,
    else the largest divisor of the local batch ≤ 2·S."""
    for m in (2 * s, s):
        if b_loc % m == 0:
            return m
    for m in range(min(2 * s, b_loc), 0, -1):
        if b_loc % m == 0:
            return m
    return 1


def gpipe(
    stage_fn: Callable,
    stacked: Any,
    x: jnp.ndarray,
    *,
    mesh,
    n_micro: Optional[int] = None,
    axis: str = "pipe",
    data_axis: str = "data",
    consts: Sequence[Any] = (),
) -> jnp.ndarray:
    """Apply ``L`` stacked layers to ``x`` as an ``S``-stage pipeline.

    ``stage_fn(layer_params, h, *consts) -> h`` must be shape-preserving;
    ``stacked`` is a pytree whose every leaf has leading axis ``L`` (one
    slice per layer, sharded ``P(axis)``); ``x`` is the global ``[B, ...]``
    activation (sharded ``P(data_axis)``); ``consts`` are replicated
    extras (e.g. an additive attention mask).
    """
    S = int(mesh.shape[axis])
    dsize = int(mesh.shape[data_axis]) if data_axis in mesh.axis_names else 1
    L = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    assert L % S == 0, f"{L} layers not divisible into {S} pipeline stages"
    B = x.shape[0]
    assert B % dsize == 0, f"batch {B} not divisible over data={dsize}"
    b_loc = B // dsize
    M = int(n_micro) if n_micro else _default_microbatches(b_loc, S)
    assert b_loc % M == 0, f"local batch {b_loc} not divisible into {M} microbatches"
    mb = b_loc // M
    steps = M + S - 1

    def per_device(p_loc, x_loc, *cs):
        sidx = jax.lax.axis_index(axis)
        xm = x_loc.reshape(M, mb, *x_loc.shape[1:])
        n_loc = L // S

        def apply_stage(h):
            # STATIC unroll over this stage's layers: a Pallas kernel inside
            # a lax.scan/while body blows XLA's scoped-vmem accounting on
            # TPU (measured: "Scoped allocation ... exceeded scoped vmem
            # limit" at the flagship shape); straight-line code compiles
            # exactly like the unrolled Transformer does.
            for i in range(n_loc):
                p_i = jax.tree_util.tree_map(lambda v, i=i: v[i], p_loc)
                h = stage_fn(p_i, h, *cs)
            return h

        state = jnp.zeros_like(xm[0])
        outs = []
        for t in range(steps):  # static tick unroll (M + S - 1 ticks)
            # stage 0 ingests microbatch t (clamped re-ingest during drain
            # is computed then discarded — SPMD cannot skip per-device work)
            state = jnp.where(sidx == 0, xm[min(t, M - 1)], state)
            y = apply_stage(state)
            if t >= S - 1:  # the last stage emits microbatch t-(S-1)
                outs.append(jnp.where(sidx == S - 1, y, jnp.zeros_like(y)))
            # shift stage outputs one hop down the pipe (stage 0 receives
            # zeros — overwritten by the next ingest)
            state = jax.lax.ppermute(y, axis, [(i, i + 1) for i in range(S - 1)])
        # only the last stage wrote real outputs; psum replicates them
        out = jax.lax.psum(jnp.stack(outs[:M]), axis)
        return out.reshape(x_loc.shape)

    xspec = P(data_axis) if dsize > 1 else P()
    in_specs = (P(axis), xspec) + tuple(P() for _ in consts)
    return _smap(per_device, mesh, in_specs, xspec)(stacked, x, *consts)


# ---------------------------------------------------------------------------
# layout converters: unrolled block_{i} <-> stacked [L, ...] 'blocks'
# ---------------------------------------------------------------------------

_BLOCK_RE = re.compile(r"^block_(\d+)$")


def stack_block_tree(tree: dict) -> Any:
    """``{'block_0': sub, 'block_1': sub, ...}`` → one pytree whose leaves
    gain a leading layer axis (the ``StackedTransformer`` param layout)."""
    idx = sorted(int(m.group(1)) for k in tree if (m := _BLOCK_RE.match(k)))
    assert idx == list(range(len(idx))), f"non-contiguous block indices: {idx}"
    subs = [tree[f"block_{i}"] for i in idx]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *subs)


def unstack_block_tree(stacked: Any) -> dict:
    """Inverse of :func:`stack_block_tree`."""
    L = int(jax.tree_util.tree_leaves(stacked)[0].shape[0])
    return {
        f"block_{i}": jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
        for i in range(L)
    }


def _is_block_dict(d) -> bool:
    return isinstance(d, dict) and any(_BLOCK_RE.match(k) for k in d)


def is_stacked_blocks(d) -> bool:
    """True for a StackedTransformer ``blocks`` subtree: a dict whose
    children are NOT unrolled ``block_{i}`` entries (the DeiT tower nests
    its *unrolled* trunk under the same ``blocks`` name — nn/deit.py) and
    whose array leaves all share one leading layer axis."""
    if not isinstance(d, dict) or _is_block_dict(d):
        return False
    leaves = jax.tree_util.tree_leaves(d)
    if not leaves:
        return False
    dims = {getattr(x, "shape", (None,))[0] if getattr(x, "ndim", 0) >= 1 else None for x in leaves}
    return len(dims) == 1 and None not in dims


def adapt_trunk_layout(src: Any, target: Any) -> Any:
    """Recursively re-lay ``src`` params to match ``target``'s trunk layout:
    wherever ``target`` stores a stacked ``blocks`` subtree but ``src`` has
    unrolled ``block_{i}`` children (or vice versa), convert. Everything
    else passes through unchanged. Used at the porter boundaries
    (``ckpt/*`` emit the reference's unrolled layout)."""
    if not (isinstance(src, dict) and isinstance(target, dict)):
        return src
    if (
        "blocks" in target
        and is_stacked_blocks(target["blocks"])
        and "blocks" not in src
        and _is_block_dict(src)
    ):
        rest = {k: v for k, v in src.items() if not _BLOCK_RE.match(k)}
        blocks = {k: v for k, v in src.items() if _BLOCK_RE.match(k)}
        out = {k: adapt_trunk_layout(v, target.get(k, v)) for k, v in rest.items()}
        out["blocks"] = stack_block_tree(blocks)
        return out
    if (
        _is_block_dict(target)
        and "blocks" in src
        and is_stacked_blocks(src["blocks"])
        and not _is_block_dict(src)
    ):
        rest = {k: v for k, v in src.items() if k != "blocks"}
        out = {k: adapt_trunk_layout(v, target.get(k, v)) for k, v in rest.items()}
        out.update(unstack_block_tree(src["blocks"]))
        return out
    return {k: adapt_trunk_layout(v, target[k]) if k in target else v for k, v in src.items()}


def unstack_in_tree(tree: Any) -> Any:
    """Replace every stacked ``blocks`` subtree with unrolled ``block_{i}``
    children — the exporters' canonical (reference-compatible) layout."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if k == "blocks" and is_stacked_blocks(v):
            out.update(unstack_block_tree(v))
        else:
            out[k] = unstack_in_tree(v)
    return out
