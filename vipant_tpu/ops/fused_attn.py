"""Fused (LayerNorm +) qkv-projection + attention + out-projection
(+ residual) Pallas kernel — the whole attention sub-block of a pre-LN
transformer layer in one VMEM-resident pass.

The round-1 attention path computed the qkv matmul in XLA, then relayouted
[B,T,H,D] -> [B*H,T,D] for the Pallas kernel and back — ~8 HBM-size copies
per layer per direction (the dominant non-matmul cost in the op profile),
plus separate fp32 LayerNorm and residual passes. This kernel removes the
head-major layout from existence: one grid step per batch item computes,
entirely in VMEM,

    h   [T,C]  = LN(x)·s + b            (fp32 stats, optional)
    qkv_t [3C,T] = Wqkv^T · h^T         (TT-orientation dot — no transposes)
    all heads at once via the free view [3C,T] -> [3H,D,T]:
        s [H,Ti,Tj] = q^T·k · scale (+bias);  p = softmax_j(s)
        o [H,D,Ti]  = v · p^T
    y   [T,C]  = out_t^T · Wout + bout  (the TN dot un-transposes for free)
    out        = x + y                  (optional residual)

Every step is an MXU dot with varied contraction dims; head slices are
sublane slices (D = 8x sublane tile multiples). The backward kernel
recomputes the softmax from x (flash-style — nothing quadratic or
head-major ever touches HBM) and accumulates weight/LN gradients across
the sequential grid; under a data-sharded mesh the op shard_maps the
batch and psums those grads.

Capability parity: torch ``nn.MultiheadAttention`` packed projections +
fp32-island LayerNorm as used by the reference towers
(`/root/reference/clip/model.py:154-200`). Falls back transparently
off-TPU (see nn/layers.py dispatcher).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _dg(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())), preferred_element_type=jnp.float32)


def _bdg(a, b, dims):
    """dot batched over the leading (head) axis."""
    return jax.lax.dot_general(
        a, b, (dims, ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _ln_fwd(x, lns, lnb):
    """fp32-island LayerNorm. Returns (h(bf16), xhat(f32), rstd(f32))."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * rstd
    h = (xhat * lns + lnb).astype(x.dtype)
    return h, xhat, rstd


# ---------------------------------------------------------------------------
# kernels (grid over batch items)
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, scale, heads, has_bias, has_ln, has_res, save_qkv,
                head_dim=None):
    refs = list(refs)
    x_ref = refs.pop(0)
    lns_ref = refs.pop(0) if has_ln else None
    lnb_ref = refs.pop(0) if has_ln else None
    wqkv_ref, bqkv_ref, wout_ref, bout_ref = refs[:4]
    refs = refs[4:]
    bias_ref = refs.pop(0) if has_bias else None
    o_ref = refs.pop(0)
    qkv_ref = refs.pop(0) if save_qkv else None

    x = x_ref[0]  # [T, C]
    T, C = x.shape
    # head_dim is explicit under tensor parallelism, where `heads` is the
    # LOCAL head count and the weight slices are [C, 3·heads·D]
    D = head_dim if head_dim is not None else C // heads
    h = _ln_fwd(x, lns_ref[...], lnb_ref[...])[0] if has_ln else x
    qkv = _dg(wqkv_ref[...], h, ((0,), (1,))) + bqkv_ref[...]  # [3Cl, T] f32
    # [3Cl,T] -> [3H,D,T] is a pure view (leading-dim split; tiles live on the
    # trailing [D,T]), so all heads run in ONE batched MXU dot per stage
    qkv3 = qkv.astype(x.dtype).reshape(3 * heads, D, T)
    if save_qkv:  # stash for the backward pass (skips the qkv recompute dot)
        qkv_ref[0] = qkv3.reshape(3 * heads * D, T)
    q3, k3, v3 = qkv3[:heads], qkv3[heads:2 * heads], qkv3[2 * heads:]
    s = _bdg(q3, k3, ((1,), (1,))) * scale  # [H, Ti, Tj]
    if has_bias:
        s = s + bias_ref[...][None]
    p = _softmax_rows(s).astype(x.dtype)
    o3 = _bdg(v3, p, ((2,), (2,)))  # [H, D, Ti]
    out_t = o3.astype(x.dtype).reshape(heads * D, T)
    y = _dg(out_t, wout_ref[...], ((0,), (0,))) + bout_ref[...]  # [T, C]
    y = y.astype(o_ref.dtype)
    o_ref[0] = x + y if has_res else y


def _fwd_int8_kernel(*refs, scale, heads, has_bias, has_ln, has_res,
                     head_dim=None):
    """Serving-only int8 variant of ``_fwd_kernel``: the qkv and output
    projections run int8×int8→int32 on the MXU (weights pre-quantized per
    output column; activations per-token, quantized in VMEM), the score /
    context dots stay bf16 (K=D=64 contractions gain nothing from int8).
    Measured 1.09× over the bf16 kernel at B=256, block cosine ≥ 0.999997
    (docs/performance.md int8 serving section)."""
    refs = list(refs)
    x_ref = refs.pop(0)
    lns_ref = refs.pop(0) if has_ln else None
    lnb_ref = refs.pop(0) if has_ln else None
    wqkv_ref, swq_ref, bqkv_ref, wout_ref, swo_ref, bout_ref = refs[:6]
    refs = refs[6:]
    bias_ref = refs.pop(0) if has_bias else None
    o_ref = refs.pop(0)

    x = x_ref[0]  # [T, C]
    T, C = x.shape
    D = head_dim if head_dim is not None else C // heads
    h = _ln_fwd(x, lns_ref[...], lnb_ref[...])[0] if has_ln else x
    h32 = h.astype(jnp.float32)
    sh = jnp.max(jnp.abs(h32), axis=-1, keepdims=True) / 127.0 + 1e-12  # [T, 1]
    hi = jnp.clip(jnp.round(h32 / sh), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(  # TT orientation, contract C: [3C, T] int32
        wqkv_ref[...], hi, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    qkv = (
        acc.astype(jnp.float32) * swq_ref[...].reshape(-1, 1) * sh.reshape(1, -1)
        + bqkv_ref[...]
    )
    qkv3 = qkv.astype(x.dtype).reshape(3 * heads, D, T)
    q3, k3, v3 = qkv3[:heads], qkv3[heads:2 * heads], qkv3[2 * heads:]
    s = _bdg(q3, k3, ((1,), (1,))) * scale  # [H, Ti, Tj]
    if has_bias:
        s = s + bias_ref[...][None]
    p = _softmax_rows(s).astype(x.dtype)
    o3 = _bdg(v3, p, ((2,), (2,)))  # [H, D, Ti] f32
    out_t = o3.reshape(heads * D, T)
    so = jnp.max(jnp.abs(out_t), axis=0, keepdims=True) / 127.0 + 1e-12  # [1, T]
    oi = jnp.clip(jnp.round(out_t / so), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(  # contract HD: [T, C] int32
        oi, wout_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc2.astype(jnp.float32) * so.reshape(-1, 1) * swo_ref[...] + bout_ref[...]
    y = y.astype(o_ref.dtype)
    o_ref[0] = x + y if has_res else y


def _bwd_kernel(*refs, scale, heads, has_bias, has_ln, has_res, saved_qkv,
                head_dim=None):
    refs = list(refs)
    x_ref = refs.pop(0)
    lns_ref = refs.pop(0) if has_ln else None
    lnb_ref = refs.pop(0) if has_ln else None
    wqkv_ref, bqkv_ref, wout_ref, g_ref = refs[:4]
    refs = refs[4:]
    bias_ref = refs.pop(0) if has_bias else None
    sqkv_ref = refs.pop(0) if saved_qkv else None
    dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref = refs[:5]
    refs = refs[5:]
    dlns_ref = refs.pop(0) if has_ln else None
    dlnb_ref = refs.pop(0) if has_ln else None

    x = x_ref[0]  # [T, C] bf16
    g = g_ref[0]  # [T, C] bf16
    T, C = x.shape
    D = head_dim if head_dim is not None else C // heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)
        if has_ln:
            dlns_ref[...] = jnp.zeros_like(dlns_ref)
            dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

    # recompute the forward in VMEM (flash-style); with a saved qkv the
    # expensive projection dot is skipped (LN stats recompute is VPU-cheap
    # and still needed for the LN backward)
    if has_ln:
        h, xhat, rstd = _ln_fwd(x, lns_ref[...], lnb_ref[...])
    else:
        h = x
    if saved_qkv:
        qkv3 = sqkv_ref[0].reshape(3 * heads, D, T)
    else:
        qkv = _dg(wqkv_ref[...], h, ((0,), (1,))) + bqkv_ref[...]
        qkv3 = qkv.astype(x.dtype).reshape(3 * heads, D, T)  # free view
    q3, k3, v3 = qkv3[:heads], qkv3[heads:2 * heads], qkv3[2 * heads:]
    s = _bdg(q3, k3, ((1,), (1,))) * scale  # [H, Ti, Tj]
    if has_bias:
        s = s + bias_ref[...][None]
    p = _softmax_rows(s)  # [H, Ti, Tj] f32
    pb = p.astype(x.dtype)

    dbout_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)  # [1, C]
    do3 = _dg(wout_ref[...], g, ((1,), (1,))).astype(x.dtype).reshape(heads, D, T)
    out_t = _bdg(v3, pb, ((2,), (2,))).astype(x.dtype).reshape(heads * D, T)
    dwout_ref[...] += _dg(out_t, g, ((1,), (0,)))  # [C, C']

    dp = _bdg(do3, v3, ((1,), (1,)))  # [H, Ti, Tj]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # [H, Ti, 1]
    ds = (p * (dp - delta) * scale).astype(x.dtype)  # [H, Ti, Tj]
    dq3 = _bdg(k3, ds, ((2,), (2,)))  # [H, D, Ti]
    dk3 = _bdg(q3, ds, ((2,), (1,)))  # [H, D, Tj]
    dv3 = _bdg(do3, pb, ((2,), (1,)))  # [H, D, Tj]
    dqkv = jnp.concatenate([dq3, dk3, dv3], axis=0).reshape(3 * heads * D, T)  # f32
    dbqkv_ref[...] += jnp.sum(dqkv, axis=1, keepdims=True)  # [3C, 1]
    dqkv_b = dqkv.astype(x.dtype)
    dh = _dg(dqkv_b, wqkv_ref[...], ((0,), (1,)))  # [T, C] f32
    dwqkv_ref[...] += _dg(h, dqkv_b, ((0,), (1,)))  # [C, 3C]

    if has_ln:
        dlns_ref[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)  # [1, C]
        dlnb_ref[...] += jnp.sum(dh, axis=0, keepdims=True)  # [1, C]
        dxhat = dh * lns_ref[...]
        dx = rstd * (
            dxhat
            - jnp.mean(dxhat, axis=1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=1, keepdims=True)
        )
    else:
        dx = dh
    if has_res:
        dx = dx + g.astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

_VMEM_LIMIT = 110 * 1024 * 1024


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)


def _item_spec(T, C):
    return pl.BlockSpec((1, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _fwd_call(x, lns, lnb, wqkv, bqkv, wout, bout, bias, scale, heads, has_res,
              save_qkv=False, head_dim=None):
    B, T, C = x.shape
    C3 = wqkv.shape[1]  # == 3C, or the local 3·H_local·D slice under TP
    has_bias, has_ln = bias is not None, lns is not None
    args = (x,) + ((lns, lnb) if has_ln else ()) + (wqkv, bqkv, wout, bout)
    args += (bias,) if has_bias else ()
    out_specs = _item_spec(T, C)
    out_shape = jax.ShapeDtypeStruct((B, T, C), x.dtype)
    if save_qkv:
        qspec = pl.BlockSpec((1, C3, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        out_specs = (out_specs, qspec)
        out_shape = (out_shape, jax.ShapeDtypeStruct((B, C3, T), x.dtype))
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, heads=heads, has_bias=has_bias,
            has_ln=has_ln, has_res=has_res, save_qkv=save_qkv, head_dim=head_dim,
        ),
        grid=(B,),
        in_specs=[_item_spec(T, C)]
        + ([_const_spec((1, C))] * 2 if has_ln else [])
        + [
            _const_spec(wqkv.shape),
            _const_spec(bqkv.shape),
            _const_spec(wout.shape),
            _const_spec(bout.shape),
        ]
        + ([_const_spec((T, T))] if has_bias else []),
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def _fwd_int8_call(x, lns, lnb, wqkv_i8, swq, bqkv, wout_i8, swo, bout, bias,
                   scale, heads, has_res, head_dim=None):
    B, T, C = x.shape
    has_bias, has_ln = bias is not None, lns is not None
    args = (x,) + ((lns, lnb) if has_ln else ())
    args += (wqkv_i8, swq, bqkv, wout_i8, swo, bout)
    args += (bias,) if has_bias else ()
    return pl.pallas_call(
        functools.partial(
            _fwd_int8_kernel, scale=scale, heads=heads, has_bias=has_bias,
            has_ln=has_ln, has_res=has_res, head_dim=head_dim,
        ),
        grid=(B,),
        in_specs=[_item_spec(T, C)]
        + ([_const_spec((1, C))] * 2 if has_ln else [])
        + [
            _const_spec(wqkv_i8.shape),
            _const_spec(swq.shape),
            _const_spec(bqkv.shape),
            _const_spec(wout_i8.shape),
            _const_spec(swo.shape),
            _const_spec(bout.shape),
        ]
        + ([_const_spec((T, T))] if has_bias else []),
        out_specs=_item_spec(T, C),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def _bwd_call(x, lns, lnb, wqkv, bqkv, wout, bias, g, scale, heads, has_res,
              saved_qkv=None, head_dim=None):
    B, T, C = x.shape
    C3 = wqkv.shape[1]  # == 3C, or the local 3·H_local·D slice under TP
    Co = wout.shape[0]  # == C, or the local H_local·D rows under TP
    has_bias, has_ln = bias is not None, lns is not None
    args = (x,) + ((lns, lnb) if has_ln else ()) + (wqkv, bqkv, wout, g)
    args += (bias,) if has_bias else ()
    args += (saved_qkv,) if saved_qkv is not None else ()
    out_specs = (
        _item_spec(T, C),
        _const_spec((C, C3)),
        _const_spec((C3, 1)),
        _const_spec((Co, C)),
        _const_spec((1, C)),
    ) + ((_const_spec((1, C)), _const_spec((1, C))) if has_ln else ())
    out_shape = (
        jax.ShapeDtypeStruct((B, T, C), x.dtype),
        jax.ShapeDtypeStruct((C, C3), jnp.float32),
        jax.ShapeDtypeStruct((C3, 1), jnp.float32),
        jax.ShapeDtypeStruct((Co, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    ) + (
        (jax.ShapeDtypeStruct((1, C), jnp.float32),) * 2 if has_ln else ()
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, heads=heads, has_bias=has_bias,
            has_ln=has_ln, has_res=has_res, saved_qkv=saved_qkv is not None,
            head_dim=head_dim,
        ),
        grid=(B,),
        in_specs=[_item_spec(T, C)]
        + ([_const_spec((1, C))] * 2 if has_ln else [])
        + [
            _const_spec((C, C3)),
            _const_spec((C3, 1)),
            _const_spec((Co, C)),
            _item_spec(T, C),
        ]
        + ([_const_spec((T, T))] if has_bias else [])
        + (
            [pl.BlockSpec((1, C3, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
            if saved_qkv is not None
            else []
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)


# ---------------------------------------------------------------------------
# mesh partitioning: the custom call is opaque to GSPMD, so shard the batch
# explicitly and psum the weight grads across the data axis
# ---------------------------------------------------------------------------


def _mesh_info(heads: int, env_flag: str = "VIPANT_TP_ATTN"):
    """(mesh, tp_size): the ambient mesh when the op must shard_map itself
    (data axis > 1 and/or an applicable tensor-parallel model axis), plus
    the model-axis size to split over (1 = no TP). ``heads`` is the unit
    the caller splits on the model axis (attention heads; the MLP passes
    its hidden width E); ``env_flag`` is the kill-switch env var."""
    import os

    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:  # noqa: BLE001
        return None, 1
    if mesh is None or getattr(mesh, "empty", True) or "data" not in mesh.axis_names:
        return None, 1
    from ..parallel.spmd import is_manual

    if is_manual(mesh):
        # already inside a shard_map body (e.g. a gpipe pipeline stage,
        # parallel/pipeline.py) — run the plain per-device kernel; a
        # nested shard_map over manual axes would be an error
        return None, 1
    tp = 1
    if (
        "model" in mesh.axis_names
        and mesh.shape["model"] > 1
        and heads % mesh.shape["model"] == 0
        and os.environ.get(env_flag, "1") == "1"
    ):
        tp = mesh.shape["model"]
    if mesh.shape["data"] <= 1 and tp == 1:
        return None, 1
    return mesh, tp


def _smap(f, mesh, in_specs, out_specs):
    from ..parallel.spmd import smap

    return smap(f, mesh, in_specs, out_specs)


def _flat_qkv(wqkv3, bqkv2):
    """[C, 3, Cl] / [3, Cl] -> the kernel's packed 2D layout
    [C, (q|k|v)·Cl] / [3Cl, 1]. A contiguous reshape: free, and LOCAL under
    shard_map (the model axis shards the trailing head-block dim, so each
    shard's view is exactly its (q_m|k_m|v_m) packed slice)."""
    C = wqkv3.shape[0]
    return wqkv3.reshape(C, -1), bqkv2.reshape(-1, 1)


def _fwd_sharded(x, lns, lnb, wqkv, bqkv, wout, bout, bias, scale, heads, has_res,
                 save_qkv=False):
    """wqkv: [C, 3, C]; bqkv: [3, C]; wout: [C, C] (rows head-major).

    Under tensor parallelism the weights arrive ALREADY model-sharded in
    HBM (parallel/mesh.py param_shardings): in_specs carry the sharded
    specs, and each shard's local reshape recovers its packed head-block
    slice — no replicated copies, per-device attention weight bytes are
    ~1/tp (VERDICT r3 #3)."""
    mesh, tp = _mesh_info(heads)
    if mesh is None:
        wq2, bq1 = _flat_qkv(wqkv, bqkv)
        return _fwd_call(
            x, lns, lnb, wq2, bq1, wout, bout, bias, scale, heads, has_res,
            save_qkv=save_qkv,
        )
    from jax.sharding import PartitionSpec as P

    d, r = P("data"), P()
    has_ln, has_bias = lns is not None, bias is not None
    head_dim = x.shape[-1] // heads
    args = (x,) + ((lns, lnb) if has_ln else ()) + (wqkv, bqkv, wout, bout)
    args += (bias,) if has_bias else ()
    wspecs = (
        (P(None, None, "model"), P(None, "model"), P("model", None), r)
        if tp > 1
        else (r, r, r, r)
    )

    def local(*a):
        a = list(a)
        xs = a.pop(0)
        ls, lb = (a.pop(0), a.pop(0)) if has_ln else (None, None)
        wq3, bq2, wo, bo = a[:4]
        bb = a[4] if has_bias else None
        wq, bq = _flat_qkv(wq3, bq2)
        if tp == 1:
            return _fwd_call(
                xs, ls, lb, wq, bq, wo, bo, bb, scale, heads, has_res,
                save_qkv=save_qkv,
            )
        # tensor-parallel heads: this shard computes its H/tp heads with its
        # own (sharded-at-rest) weight slices; partial out-projections psum
        # over `model`. bout/tp so the psum reconstructs the bias once; the
        # residual is added after the psum.
        hm = heads // tp
        out = _fwd_call(
            xs, ls, lb, wq, bq, wo, bo / tp, bb, scale, hm,
            has_res=False, save_qkv=save_qkv, head_dim=head_dim,
        )
        y, sq = out if save_qkv else (out, None)
        y = jax.lax.psum(y, axis_name="model")
        if has_res:
            y = xs + y
        return (y, sq) if save_qkv else y

    dm = P("data", "model")  # saved qkv: per-shard head blocks along dim 1
    fn = _smap(
        local,
        mesh,
        in_specs=(d,) + ((r, r) if has_ln else ()) + wspecs + ((r,) if has_bias else ()),
        out_specs=(d, dm if tp > 1 else d) if save_qkv else d,
    )
    return fn(*args)


def _bwd_sharded(x, lns, lnb, wqkv, bqkv, wout, bias, g, scale, heads, has_res,
                 saved_qkv=None):
    """Weight grads mirror the forward's shardings: under TP each shard
    emits ITS head-block grads (psum over `data` only — assembling full
    grads over `model` would immediately be re-scattered by the sharded
    optimizer update anyway)."""
    mesh, tp = _mesh_info(heads)
    if mesh is None:
        wq2, bq1 = _flat_qkv(wqkv, bqkv)
        outs = _bwd_call(
            x, lns, lnb, wq2, bq1, wout, bias, g, scale, heads, has_res,
            saved_qkv=saved_qkv,
        )
        return outs
    from jax.sharding import PartitionSpec as P

    d, r = P("data"), P()
    has_ln, has_bias = lns is not None, bias is not None
    has_saved = saved_qkv is not None
    head_dim = x.shape[-1] // heads
    args = (x,) + ((lns, lnb) if has_ln else ()) + (wqkv, bqkv, wout, g)
    args += (bias,) if has_bias else ()
    args += (saved_qkv,) if has_saved else ()
    wspecs = (
        (P(None, None, "model"), P(None, "model"), P("model", None))
        if tp > 1
        else (r, r, r)
    )

    def local(*a):
        a = list(a)
        xs = a.pop(0)
        ls, lb = (a.pop(0), a.pop(0)) if has_ln else (None, None)
        wq3, bq2, wo, gs = a[:4]
        a = a[4:]
        bb = a.pop(0) if has_bias else None
        sq = a.pop(0) if has_saved else None
        wq, bq = _flat_qkv(wq3, bq2)
        if tp == 1:
            outs = _bwd_call(
                xs, ls, lb, wq, bq, wo, bb, gs, scale, heads, has_res, saved_qkv=sq
            )
            # weight/LN grads are partial sums over this shard's batch items
            # (2D kernel-layout grads; _fused_bwd reshapes to param shapes)
            dx, rest = outs[0], jax.lax.psum(outs[1:], axis_name="data")
            return (dx,) + tuple(rest)
        return _bwd_local_tp(
            xs, ls, lb, wq, bq, wo, bb, gs, sq, scale, heads, head_dim, tp,
            has_ln, has_res,
        )

    # dx + (dwqkv, dbqkv, dwout, dbout) + optional (dlns, dlnb)
    wgrad_specs = (
        (P(None, None, "model"), P(None, "model"), P("model", None), r)
        if tp > 1
        else (r, r, r, r)
    )
    out_specs = (d,) + wgrad_specs + ((r, r) if has_ln else ())
    fn = _smap(
        local,
        mesh,
        in_specs=(d,) + ((r, r) if has_ln else ()) + wspecs + (d,)
        + ((r,) if has_bias else ())
        + (((P("data", "model") if tp > 1 else d),) if has_saved else ()),
        out_specs=out_specs,
    )
    return fn(*args)


def _bwd_local_tp(xs, ls, lb, wq, bq, wo, bb, gs, sq, scale, heads, head_dim,
                  tp, has_ln, has_res):
    """Per-model-shard backward under tensor-parallel heads.

    The kernel runs LN-free on h = LN(x): its dx output is then the
    PARTIAL dh of this shard's heads, which must be psum'd over `model`
    before the (full-width) LayerNorm backward — so LN fwd/bwd run here in
    XLA (cheap VPU work), and the kernel handles only the head-sharded
    projections + attention. wq/bq/wo arrive as THIS shard's local slices
    (sharded at rest); their grads leave local too — psum over `data` only.
    dbout/dlns/dlnb derive from model-replicated values, so they psum over
    `data` and stay replicated along `model`."""
    hm = heads // tp
    C = xs.shape[-1]
    if has_ln:
        x32 = xs.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + LN_EPS)
        xhat = xc * rstd
        h = (xhat * ls.reshape(-1) + lb.reshape(-1)).astype(xs.dtype)
    else:
        h = xs
    outs = _bwd_call(
        h, None, None, wq, bq, wo, bb, gs, scale, hm,
        has_res=False, saved_qkv=sq, head_dim=head_dim,
    )
    dh_p, dwq_m, dbq_m, dwo_m, dbo = outs[:5]
    dh = jax.lax.psum(dh_p, axis_name="model")
    if has_ln:
        dh32 = dh.astype(jnp.float32)
        dlns = jnp.sum(dh32 * xhat, axis=(0, 1)).reshape(1, C)
        dlnb = jnp.sum(dh32, axis=(0, 1)).reshape(1, C)
        dxhat = dh32 * ls.reshape(-1)
        dx = rstd * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        )
        if has_res:  # the LN variant is the full residual sub-block: dx += g
            dx = dx + gs.astype(jnp.float32)
        dx = dx.astype(xs.dtype)
    else:
        dx = dh if not has_res else (dh + gs).astype(xs.dtype)
    # local head-block grads in param layout: [C, 3, Cm] / [3, Cm] / [Cm, C]
    Cm = hm * head_dim
    acc = (
        dwq_m.reshape(C, 3, Cm),
        dbq_m.reshape(3, Cm),
        dwo_m,
        dbo,
    )
    if has_ln:
        acc += (dlns, dlnb)
    acc = jax.lax.psum(acc, axis_name="data")
    return (dx,) + tuple(acc)


# ---------------------------------------------------------------------------
# public ops
# ---------------------------------------------------------------------------


def _prep(x, wqkv, bqkv, wout, bout, lns, lnb):
    """Dtype prep only — shapes stay in param layout (wqkv [C, 3, C],
    bqkv [3, C]); the sharded dispatchers flatten to the kernel's packed
    2D layout LOCALLY (after any model-axis sharding)."""
    cw = lambda w: w.astype(x.dtype)
    out = (
        cw(wqkv),
        bqkv.astype(jnp.float32),
        cw(wout),
        bout.astype(jnp.float32).reshape(1, -1),
    )
    if lns is None:
        return (None, None) + out
    return (
        lns.astype(jnp.float32).reshape(1, -1),
        lnb.astype(jnp.float32).reshape(1, -1),
    ) + out


def _want_save_qkv(B: int, T: int, C: int, itemsize: int = 2) -> bool:
    """Trade HBM for FLOPs: stash the packed qkv in fwd so bwd skips its
    recompute dot. Pays off for long sequences (audio tower); off for short
    ones, off above a per-layer HBM budget (the stash is ``B*3C*T*itemsize``
    bytes PER LAYER and lives until the backward — cap keeps giant batches
    from OOMing), and off-able via ``VIPANT_SAVE_QKV=0``."""
    import os

    if os.environ.get("VIPANT_SAVE_QKV", "1") != "1" or T < 128:
        return False
    max_mb = float(os.environ.get("VIPANT_SAVE_QKV_MAX_MB", "256"))
    return B * 3 * C * T * itemsize <= max_mb * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused(x, wqkv, bqkv, wout, bout, lns, lnb, bias, scale, heads):
    has_res = lns is not None  # LN variant is the full residual sub-block
    ls, lb, wq, bq, wo, bo = _prep(x, wqkv, bqkv, wout, bout, lns, lnb)
    return _fwd_sharded(x, ls, lb, wq, bq, wo, bo, bias, scale, heads, has_res)


def _fused_fwd(x, wqkv, bqkv, wout, bout, lns, lnb, bias, scale, heads):
    has_res = lns is not None
    save = _want_save_qkv(
        x.shape[0], x.shape[1], x.shape[2], itemsize=x.dtype.itemsize
    )
    ls, lb, wq, bq, wo, bo = _prep(x, wqkv, bqkv, wout, bout, lns, lnb)
    out = _fwd_sharded(
        x, ls, lb, wq, bq, wo, bo, bias, scale, heads, has_res, save_qkv=save
    )
    out, saved_qkv = out if save else (out, None)
    return out, (x, wqkv, bqkv, wout, bout, lns, lnb, bias, saved_qkv)


def _fused_bwd(scale, heads, res, g):
    x, wqkv, bqkv, wout, bout, lns, lnb, bias, saved_qkv = res
    has_ln = lns is not None
    ls, lb, wq, bq, wo, _ = _prep(x, wqkv, bqkv, wout, bout, lns, lnb)
    outs = _bwd_sharded(
        x, ls, lb, wq, bq, wo, bias, g.astype(x.dtype), scale, heads, has_ln,
        saved_qkv=saved_qkv,
    )
    dx, dwqkv, dbqkv, dwout, dbout = outs[:5]
    ret = (
        dx,
        dwqkv.reshape(wqkv.shape).astype(wqkv.dtype),
        dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
        dwout.astype(wout.dtype),
        dbout.reshape(bout.shape).astype(bout.dtype),
    )
    if has_ln:
        dlns, dlnb = outs[5:]
        ret += (
            dlns.reshape(lns.shape).astype(lns.dtype),
            dlnb.reshape(lnb.shape).astype(lnb.dtype),
        )
    else:
        ret += (None, None)
    # bias is a constant mask (causal/padding); no grad
    return ret + (None,)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _vmem_estimate(T, C, heads):
    """Rough fwd+bwd VMEM high-water estimate (bytes) for one grid step."""
    Tp = -(-T // 8) * 8
    Tl = -(-T // 128) * 128
    f32tt = heads * Tp * Tl * 4
    return (
        4 * 3 * C * Tl * 4  # qkv_t + dqkv(f32) + views
        + 4 * f32tt  # s, p, dp, ds
        + 2 * (C * 3 * C) * 4  # wqkv + dwqkv accum
        + 3 * (C * C) * 4
        + 8 * Tp * C * 4
    )


def _canon_bias(bias):
    if bias is None:
        return None
    return jnp.maximum(bias.astype(jnp.float32), -1e30)


def fused_attention_block(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    heads: int = 12,
) -> jnp.ndarray:
    """Packed attention (no LN / residual). x: [B, T, C]; wqkv: [C, 3, C]
    (q|k|v sections along dim 1, head-major within each section — shardable
    over `model` on the last dim); bqkv: [3, C]; wout: [C, C] (rows
    head-major); bout: [C]; bias: optional constant additive [T, T]
    (e.g. causal mask — non-differentiable). Returns [B, T, C]."""
    D = x.shape[-1] // heads
    return _fused(
        x, wqkv, bqkv, wout, bout, None, None, _canon_bias(bias),
        1.0 / float(np.sqrt(D)), heads,
    )


def fused_ln_attention_block(
    x: jnp.ndarray,
    lns: jnp.ndarray,
    lnb: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    heads: int = 12,
) -> jnp.ndarray:
    """The full pre-LN attention sub-block: x + proj(attn(LN(x))).
    lns/lnb: LayerNorm scale/bias [C] (fp32-island semantics)."""
    D = x.shape[-1] // heads
    return _fused(
        x, wqkv, bqkv, wout, bout, lns, lnb, _canon_bias(bias),
        1.0 / float(np.sqrt(D)), heads,
    )


def _fused_int8(x, wqkv, bqkv, wout, bout, lns, lnb, bias, scale, heads):
    """Int8 fwd-only dispatch: quantize the projection weights per output
    column in-jit (locally, after any model-axis sharding), shard the batch
    over the data axis, and head-parallelize over the model axis exactly
    like the bf16 path — each shard quantizes and runs ITS head-block
    slices, partial out-projections psum over `model`."""
    from .quant import quantize_cols

    mesh, tp = _mesh_info(heads)
    has_res = lns is not None
    ls, lb, wq3, bq2, wo, bo = _prep(x, wqkv, bqkv, wout, bout, lns, lnb)
    has_ln, has_bias = ls is not None, bias is not None
    head_dim = x.shape[-1] // heads

    if mesh is None:
        wq, bq = _flat_qkv(wq3, bq2)
        wq_i8, swq = quantize_cols(wq)
        wo_i8, swo = quantize_cols(wo)
        return _fwd_int8_call(
            x, ls, lb, wq_i8, swq, bq, wo_i8, swo, bo, bias, scale, heads,
            has_res,
        )

    from jax.sharding import PartitionSpec as P

    d, r = P("data"), P()
    wspecs = (
        (P(None, None, "model"), P(None, "model"), P("model", None), r)
        if tp > 1
        else (r, r, r, r)
    )
    args = (x,) + ((ls, lb) if has_ln else ()) + (wq3, bq2, wo, bo)
    args += (bias,) if has_bias else ()

    def call(*a):
        a = list(a)
        xs = a.pop(0)
        ls_, lb_ = (a.pop(0), a.pop(0)) if has_ln else (None, None)
        wq3_, bq2_, wo_, bo_ = a[:4]
        bb = a[4] if has_bias else None
        wq, bq = _flat_qkv(wq3_, bq2_)
        wq_i8, swq = quantize_cols(wq)
        wo_i8, swo = quantize_cols(wo_)
        if tp == 1:
            return _fwd_int8_call(
                xs, ls_, lb_, wq_i8, swq, bq, wo_i8, swo, bo_, bb, scale,
                heads, has_res,
            )
        hm = heads // tp
        y = _fwd_int8_call(
            xs, ls_, lb_, wq_i8, swq, bq, wo_i8, swo, bo_ / tp, bb, scale,
            hm, has_res=False, head_dim=head_dim,
        )
        y = jax.lax.psum(y, axis_name="model")
        return xs + y if has_res else y

    return _smap(
        call,
        mesh,
        in_specs=(d,) + ((r, r) if has_ln else ()) + wspecs + ((r,) if has_bias else ()),
        out_specs=d,
    )(*args)


def fused_attention_block_int8(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    heads: int = 12,
) -> jnp.ndarray:
    """Int8-MXU packed attention (no LN / residual) — SERVING ONLY (no VJP;
    differentiating it fails loudly). Same signature/semantics as
    :func:`fused_attention_block`."""
    D = x.shape[-1] // heads
    return _fused_int8(
        x, wqkv, bqkv, wout, bout, None, None, _canon_bias(bias),
        1.0 / float(np.sqrt(D)), heads,
    )


def fused_ln_attention_block_int8(
    x: jnp.ndarray,
    lns: jnp.ndarray,
    lnb: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    heads: int = 12,
) -> jnp.ndarray:
    """Int8-MXU x + proj(attn(LN(x))) — SERVING ONLY. Same semantics as
    :func:`fused_ln_attention_block`; qkv/out projections on the int8 MXU,
    score/context dots bf16 (K=64 gains nothing from int8)."""
    D = x.shape[-1] // heads
    return _fused_int8(
        x, wqkv, bqkv, wout, bout, lns, lnb, _canon_bias(bias),
        1.0 / float(np.sqrt(D)), heads,
    )


def fused_block_applicable(T: int, C: int, heads: int, have_bool_mask: bool) -> bool:
    """The fused path needs sublane-aligned head slices and a VMEM-resident
    [H, T, T] score tensor. ``VIPANT_FUSED_MIN_T`` (default 0) skips the
    kernel for short sequences where XLA's batched attention wins (probe
    with experiments/variants.py)."""
    import os

    D = C // max(heads, 1)
    return (
        not have_bool_mask
        and C % heads == 0
        and D % 8 == 0
        and C % 8 == 0
        and T >= int(os.environ.get("VIPANT_FUSED_MIN_T", "0"))
        and _vmem_estimate(T, C, heads) < 95 * 1024 * 1024
    )
