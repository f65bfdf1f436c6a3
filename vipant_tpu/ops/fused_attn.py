"""Fused qkv-projection + multi-head attention + output-projection kernel.

The round-1 attention path computed the qkv matmul in XLA, then relayouted
[B,T,H,D] -> [B*H,T,D] for the Pallas kernel and back — ~8 HBM-size copies
per layer per direction (the dominant non-matmul cost in the op profile).
This kernel removes the head-major layout from existence: one grid step per
batch item computes, entirely in VMEM,

    qkv_t [3C,T] = Wqkv^T · x^T        (TT-orientation dot — no transposes)
    per head h (64-row sublane-aligned slices of qkv_t):
        s [Ti,Tj] = q_h^T·k_h · scale (+bias);  p = softmax_j(s)
        o_h [D,Ti] = v_h · p^T
    y [T,C] = out_t^T · Wout + bout     (the TN dot un-transposes for free)

Every step is an MXU dot with varied contraction dims; head slices are
sublane slices (D=64 = 8x sublane tile). The backward kernel recomputes the
softmax from x (flash-style — nothing quadratic or head-major ever touches
HBM) and accumulates the weight gradients across the sequential grid.

Capability parity: torch ``nn.MultiheadAttention`` packed projections as
used by the reference towers (`/root/reference/clip/model.py:167-200`).
Falls back transparently off-TPU (see nn/layers.py dispatcher).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dg(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())), preferred_element_type=jnp.float32)


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# kernels (grid over batch items)
# ---------------------------------------------------------------------------


def _bdg(a, b, dims):
    """dot batched over the leading (head) axis."""
    return jax.lax.dot_general(
        a, b, (dims, ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, *rest, scale, heads, has_bias):
    bias_ref, (o_ref,) = (rest[0], rest[1:]) if has_bias else (None, rest)
    x = x_ref[0]  # [T, C]
    C = x.shape[1]
    D = C // heads
    qkv = _dg(wqkv_ref[...], x, ((0,), (1,))) + bqkv_ref[...]  # [3C, T] f32
    # [3C,T] -> [3H,D,T] is a pure view (leading-dim split; tiles live on the
    # trailing [D,T]), so all heads run in ONE batched MXU dot per stage
    qkv3 = qkv.astype(x.dtype).reshape(3 * heads, D, x.shape[0])
    q3, k3, v3 = qkv3[:heads], qkv3[heads:2 * heads], qkv3[2 * heads:]
    s = _bdg(q3, k3, ((1,), (1,))) * scale  # [H, Ti, Tj]
    if has_bias:
        s = s + bias_ref[...][None]
    p = _softmax_rows(s).astype(x.dtype)
    o3 = _bdg(v3, p, ((2,), (2,)))  # [H, D, Ti]
    out_t = o3.astype(x.dtype).reshape(C, x.shape[0])  # [C, T]
    y = _dg(out_t, wout_ref[...], ((0,), (0,))) + bout_ref[...]  # [T, C]
    o_ref[0] = y.astype(o_ref.dtype)


def _bwd_kernel(
    x_ref, wqkv_ref, bqkv_ref, wout_ref, g_ref, *rest, scale, heads, has_bias
):
    if has_bias:
        (bias_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref) = rest
    else:
        (dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref) = rest
    x = x_ref[0]  # [T, C] bf16
    g = g_ref[0]  # [T, C] bf16
    C = x.shape[1]
    D = C // heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    # recompute the forward entirely in VMEM (flash-style)
    T = x.shape[0]
    qkv = _dg(wqkv_ref[...], x, ((0,), (1,))) + bqkv_ref[...]
    qkv3 = qkv.astype(x.dtype).reshape(3 * heads, D, T)  # free view
    q3, k3, v3 = qkv3[:heads], qkv3[heads:2 * heads], qkv3[2 * heads:]
    s = _bdg(q3, k3, ((1,), (1,))) * scale  # [H, Ti, Tj]
    if has_bias:
        s = s + bias_ref[...][None]
    p = _softmax_rows(s)  # [H, Ti, Tj] f32
    pb = p.astype(x.dtype)

    dbout_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)  # [1, C]
    do3 = _dg(wout_ref[...], g, ((1,), (1,))).astype(x.dtype).reshape(heads, D, T)
    out_t = _bdg(v3, pb, ((2,), (2,))).astype(x.dtype).reshape(C, T)  # [C, T]
    dwout_ref[...] += _dg(out_t, g, ((1,), (0,)))  # [C, C']

    dp = _bdg(do3, v3, ((1,), (1,)))  # [H, Ti, Tj]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # [H, Ti, 1]
    ds = (p * (dp - delta) * scale).astype(x.dtype)  # [H, Ti, Tj]
    dq3 = _bdg(k3, ds, ((2,), (2,)))  # [H, D, Ti]
    dk3 = _bdg(q3, ds, ((2,), (1,)))  # [H, D, Tj]
    dv3 = _bdg(do3, pb, ((2,), (1,)))  # [H, D, Tj]
    dqkv = jnp.concatenate([dq3, dk3, dv3], axis=0).reshape(3 * C, T)  # f32
    dbqkv_ref[...] += jnp.sum(dqkv, axis=1, keepdims=True)  # [3C, 1]
    dqkv_b = dqkv.astype(x.dtype)
    dx = _dg(dqkv_b, wqkv_ref[...], ((0,), (1,)))  # [T, C]
    dwqkv_ref[...] += _dg(x, dqkv_b, ((0,), (1,)))  # [C, 3C]
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

_VMEM_LIMIT = 110 * 1024 * 1024


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)


def _item_spec(T, C):
    return pl.BlockSpec((1, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _fwd_call(x, wqkv, bqkv, wout, bout, bias, scale, heads):
    B, T, C = x.shape
    has_bias = bias is not None
    args = (x, wqkv, bqkv, wout, bout) + ((bias,) if has_bias else ())
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, heads=heads, has_bias=has_bias),
        grid=(B,),
        in_specs=[
            _item_spec(T, C),
            _const_spec((C, 3 * C)),
            _const_spec((3 * C, 1)),
            _const_spec((C, C)),
            _const_spec((1, C)),
        ]
        + ([_const_spec((T, T))] if has_bias else []),
        out_specs=_item_spec(T, C),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def _bwd_call(x, wqkv, bqkv, wout, bias, g, scale, heads):
    B, T, C = x.shape
    has_bias = bias is not None
    args = (x, wqkv, bqkv, wout, g) + ((bias,) if has_bias else ())
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=heads, has_bias=has_bias),
        grid=(B,),
        in_specs=[
            _item_spec(T, C),
            _const_spec((C, 3 * C)),
            _const_spec((3 * C, 1)),
            _const_spec((C, C)),
            _item_spec(T, C),
        ]
        + ([_const_spec((T, T))] if has_bias else []),
        out_specs=(
            _item_spec(T, C),
            _const_spec((C, 3 * C)),
            _const_spec((3 * C, 1)),
            _const_spec((C, C)),
            _const_spec((1, C)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((3 * C, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)


# ---------------------------------------------------------------------------
# mesh partitioning: the custom call is opaque to GSPMD, so shard the batch
# explicitly and psum the weight grads across the data axis
# ---------------------------------------------------------------------------


def _data_mesh():
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:  # noqa: BLE001
        return None
    if (
        mesh is None
        or getattr(mesh, "empty", True)
        or "data" not in mesh.axis_names
        or mesh.shape["data"] <= 1
    ):
        return None
    return mesh


def _smap(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as sm2

        return sm2(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def _fwd_sharded(x, wqkv, bqkv, wout, bout, bias, scale, heads):
    mesh = _data_mesh()
    if mesh is None:
        return _fwd_call(x, wqkv, bqkv, wout, bout, bias, scale, heads)
    from jax.sharding import PartitionSpec as P

    d, r = P("data"), P()
    has_bias = bias is not None
    args = (x, wqkv, bqkv, wout, bout) + ((bias,) if has_bias else ())
    fn = _smap(
        lambda *a: _fwd_call(*a[:5], a[5] if has_bias else None, scale, heads),
        mesh,
        in_specs=(d, r, r, r, r) + ((r,) if has_bias else ()),
        out_specs=d,
    )
    return fn(*args)


def _bwd_sharded(x, wqkv, bqkv, wout, bias, g, scale, heads):
    mesh = _data_mesh()
    if mesh is None:
        return _bwd_call(x, wqkv, bqkv, wout, bias, g, scale, heads)
    from jax.sharding import PartitionSpec as P

    d, r = P("data"), P()
    has_bias = bias is not None

    def local(*a):
        xs, wq, bq, wo, gs = a[:5]
        bb = a[5] if has_bias else None
        dx, dwqkv, dbqkv, dwout, dbout = _bwd_call(xs, wq, bq, wo, bb, gs, scale, heads)
        # weight grads are partial sums over this shard's batch items
        dwqkv, dbqkv, dwout, dbout = jax.lax.psum(
            (dwqkv, dbqkv, dwout, dbout), axis_name="data"
        )
        return dx, dwqkv, dbqkv, dwout, dbout

    args = (x, wqkv, bqkv, wout, g) + ((bias,) if has_bias else ())
    fn = _smap(
        local,
        mesh,
        in_specs=(d, r, r, r, d) + ((r,) if has_bias else ()),
        out_specs=(d, r, r, r, r),
    )
    return fn(*args)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(x, wqkv, bqkv, wout, bout, bias, scale, heads):
    xw, bq1 = wqkv.astype(x.dtype), bqkv.astype(jnp.float32).reshape(-1, 1)
    wo, bo1 = wout.astype(x.dtype), bout.astype(jnp.float32).reshape(1, -1)
    return _fwd_sharded(x, xw, bq1, wo, bo1, bias, scale, heads)


def _fused_fwd(x, wqkv, bqkv, wout, bout, bias, scale, heads):
    out = _fused(x, wqkv, bqkv, wout, bout, bias, scale, heads)
    return out, (x, wqkv, bqkv, wout, bout, bias)


def _fused_bwd(scale, heads, res, g):
    x, wqkv, bqkv, wout, bout, bias = res
    dx, dwqkv, dbqkv, dwout, dbout = _bwd_sharded(
        x,
        wqkv.astype(x.dtype),
        bqkv.astype(jnp.float32).reshape(-1, 1),
        wout.astype(x.dtype),
        bias,
        g.astype(x.dtype),
        scale,
        heads,
    )
    return (
        dx,
        dwqkv.astype(wqkv.dtype),
        dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
        dwout.astype(wout.dtype),
        dbout.reshape(bout.shape).astype(bout.dtype),
        None,  # bias is a constant mask (causal/padding); no grad
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def _vmem_estimate(T, C, heads):
    """Rough fwd+bwd VMEM high-water estimate (bytes) for one grid step."""
    Tp = -(-T // 8) * 8
    Tl = -(-T // 128) * 128
    f32tt = Tp * Tl * 4
    return (
        4 * 3 * C * Tl * 4  # qkv_t + dqkv(f32) + parts
        + 6 * f32tt  # s, p, dp, ds (+slack)
        + 2 * (C * 3 * C) * 4  # wqkv + dwqkv accum
        + 3 * (C * C) * 4
        + 6 * Tp * C * 4
    )


def fused_attention_block(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    heads: int = 12,
) -> jnp.ndarray:
    """x: [B, T, C]; wqkv: [C, 3C]; bqkv: [3C]; wout: [C, C]; bout: [C];
    bias: optional constant additive [T, T] (e.g. causal mask — treated as
    non-differentiable). Returns [B, T, C]."""
    B, T, C = x.shape
    D = C // heads
    scale = 1.0 / float(np.sqrt(D))
    if bias is not None:
        bias = jnp.maximum(bias.astype(jnp.float32), -1e30)
    return _fused(x, wqkv, bqkv, wout, bout, bias, scale, heads)


def fused_block_applicable(T: int, C: int, heads: int, have_bool_mask: bool) -> bool:
    """The fused path needs sublane-aligned head slices and a VMEM-resident
    [T, T] score matrix."""
    D = C // heads
    return (
        not have_bool_mask
        and C % heads == 0
        and D % 8 == 0
        and C % 8 == 0
        and _vmem_estimate(T, C, heads) < 100 * 1024 * 1024
    )
