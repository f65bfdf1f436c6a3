"""Sequence (context) parallelism over a ``seq`` mesh axis — ring attention.

The reference's sequence scaling is purely parametric (`max_audio_len`
config + pos-emb slice/interp, `/root/reference/cvap/module/encoder/
audio_head.py:89-134`); every token of the audio sequence lives on every
device. This module adds the TPU-native *token* sharding beyond it
(SURVEY.md §5 "optional sequence sharding along time patches"): activations
``[B, T, C]`` are sharded over a ``seq`` mesh axis, every token-wise op
(LayerNorm, qkv/out projections, MLP) runs on local tokens only, and
attention becomes **ring attention** — key/value blocks rotate around the
``seq`` ring via ICI ``ppermute`` while each device folds them into a
running online-softmax accumulator (flash-attention streaming statistics),
so the full ``[T, T]`` score matrix and the gathered ``[T, C]`` activations
never exist on any one device.

Exactness: softmax is permutation-invariant over key blocks, and the
(m, l, o) online accumulation is the standard numerically-stable streaming
softmax — the result equals unsharded attention to float tolerance, and
gradients flow through ``ppermute`` (whose transpose is the reversed
permute), pinned in ``tests/test_sequence_parallel.py``.

Composition: ``seq`` composes with the ``data`` axis (each data shard runs
its own ring). It does not compose with ``pipe`` or ``model`` on the same
trunk — inside the seq shard_map the mesh is Manual, so the fused-attention
kernel's TP head split and the GPipe executor are structurally unreachable
(same guard as ``ops.fused_attn._mesh_info``); the trunk asserts the axes
are not combined.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp

_state = threading.local()


def seq_axis():
    """The active ring-attention axis name (set inside the seq-parallel
    shard_map body), or None."""
    return getattr(_state, "axis", None)


@contextmanager
def seq_context(axis: str):
    """Marks the dynamic extent in which activations' token axis is sharded
    over ``axis``: ``nn.layers.MultiHeadAttention`` and ``ops.attention``
    route self-attention to :func:`ring_attention` instead of the
    per-device kernels (which would silently attend only to local tokens)."""
    prev = getattr(_state, "axis", None)
    _state.axis = axis
    try:
        yield
    finally:
        _state.axis = prev


def seq_mesh_info(axis: str = "seq"):
    """(mesh, seq_size) when an ambient non-manual mesh carries a ``seq``
    axis > 1; (None, 1) otherwise. Mirrors ``parallel.pipeline.pipe_mesh_info``."""
    from .pipeline import pipe_mesh_info

    return pipe_mesh_info(axis=axis)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis: str,
    bias: jnp.ndarray = None,
) -> jnp.ndarray:
    """Exact attention over a token-sharded sequence.

    ``q, k, v``: this device's local shard ``[B, T_local, H, D]``
    (``jax.nn.dot_product_attention`` layout); ``axis``: the mesh axis the
    token dimension is sharded over. Must be called inside a shard_map that
    maps ``axis``.

    ``bias``: optional additive mask, ROW-SHARDED on queries — this
    device's ``[..., T_local, T_global]`` rows of the global mask
    (broadcastable leading dims, e.g. ``[1, 1, Tl, T]``). The bias never
    rotates: at ring step ``s`` this device holds the key/value block that
    originated on shard ``(i - s) mod S``, so the step's column block is a
    local ``dynamic_slice`` of the resident rows — no extra collective, and
    per-device mask bytes stay ``1/S`` of the global ``[T, T]``. This is
    what lets causal text trunks and token-packed trunks shard over ``seq``
    instead of replicating compute S-fold.

    Ring steps are statically unrolled (the ring size is a small static
    mesh dimension, and unrolled collectives schedule best — the same
    choice as the GPipe tick loop, ``parallel/pipeline.py``).
    """
    S = jax.lax.axis_size(axis)
    B, Tl, H, D = q.shape
    scale = 1.0 / float(D) ** 0.5
    qf = jnp.swapaxes(q, 1, 2)  # [B, H, Tl, D]
    me = jax.lax.axis_index(axis) if bias is not None else None
    if bias is not None:
        assert bias.shape[-2] == Tl and bias.shape[-1] == Tl * S, (
            "ring bias must be the local [.., T_local, T_global] row shard",
            bias.shape, (Tl, Tl * S),
        )
        bias = bias.astype(jnp.float32)
        if bias.ndim == 3:
            # left-padding would put dim0 in the HEAD slot — silently wrong
            # when a caller meant a per-batch [B, Tl, T] mask
            raise ValueError(
                "ring_attention bias rank 3 is ambiguous ([B, Tl, T] vs "
                "[H, Tl, T]) — pass [Tl, T] or an explicit [B, H, Tl, T]"
            )
        while bias.ndim < 4:  # [Tl, T] -> [1, 1, Tl, T]
            bias = bias[None]

    # running online-softmax statistics, fp32
    m = jnp.full((B, H, Tl, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, Tl, 1), jnp.float32)
    o = jnp.zeros((B, H, Tl, D), jnp.float32)
    perm = [(i, (i + 1) % S) for i in range(S)]

    kb, vb = k, v
    for step in range(S):
        kf = jnp.swapaxes(kb, 1, 2)  # [B, H, Tk, D]
        vf = jnp.swapaxes(vb, 1, 2)
        s = jax.lax.dot_general(
            qf, kf, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        ) * scale  # [B, H, Tl, Tk] fp32
        if bias is not None:
            # this step's k/v block originated on shard (me - step) mod S:
            # its global key positions are that shard's contiguous columns
            src = jnp.mod(me - step, S)
            s = s + jax.lax.dynamic_slice_in_dim(bias, src * Tl, Tl, axis=-1)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        # a query row whose keys so far are ALL -inf-masked keeps
        # m_new = -inf, and exp(s - m_new) = exp(-inf + inf) = NaN would
        # poison the accumulators for every later ring step even when
        # later blocks hold unmasked keys. Clamping the subtrahend keeps
        # such rows at p = exp(-inf - finite) = 0 weight (healthy rows
        # have finite m_new and are untouched); rows masked across ALL
        # steps end with l = 0 and fall through to the guard below.
        m_sub = jnp.maximum(m_new, jnp.float32(-1e30))
        p = jnp.exp(s - m_sub)
        corr = jnp.exp(m - m_sub)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vf.dtype), vf, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )
        o = o * corr + pv
        m = m_new
        if step + 1 < S:  # rotate key/value blocks one hop around the ring
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)

    # fully-masked rows (l = 0) return 0 — the flash-attention convention
    # for empty softmax rows (a dense softmax would NaN them)
    out = (o / jnp.maximum(l, jnp.float32(1e-30))).astype(q.dtype)  # [B, H, Tl, D]
    return jnp.swapaxes(out, 1, 2)
