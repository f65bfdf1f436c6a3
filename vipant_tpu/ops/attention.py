"""Fused attention Pallas kernel (forward + backward) for TPU.

At VIP-ANT sequence lengths (audio ≤ ~550 patch tokens, text 77 —
`/root/reference/cvap/module/encoder/audio_head.py:28-40` grid math), the
entire per-head [T, T] logit matrix fits in VMEM. XLA's unfused attention
writes the fp32 logits and probabilities to HBM every layer (~300 MB/layer
at batch 64); this kernel keeps logits, softmax and the PV product entirely
in VMEM — one HBM read of q/k/v, one write of the output. The backward
kernel recomputes probabilities from the saved logsumexp (flash-attention
style) so nothing quadratic is ever stored.

Performance notes (from TPU op profiles): matmuls run with bf16 operands and
fp32 accumulation (an fp32×fp32 MXU dot is emulated and ~4× slower); blocks
use the exact [T, D] array dims (legal whenever block == array dim, so no
pad/slice traffic); several heads are processed per grid step; the bias
operand only exists in the masked variant.

Falls back to ``jax.nn.dot_product_attention`` off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _bdot(a, b, dims):
    """batched over leading head axis."""
    return jax.lax.dot_general(
        a, b, (dims, ((0,), (0,))), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# kernels: grid (BH // heads_per_block,), blocks [hpb, T, D]
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, *rest, scale, has_bias):
    if has_bias:
        bias_ref, o_ref, lse_ref = rest
    else:
        (o_ref, lse_ref) = rest
    q = q_ref[...]  # [h, T, D] bf16/f32 — stays in input dtype for the MXU
    k = k_ref[...]
    v = v_ref[...]
    s = _bdot(q, k, (((2,), (2,)))) * scale  # [h, T, T] fp32
    if has_bias:
        s = s + bias_ref[...][None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = _bdot((p / l).astype(v.dtype), v, (((2,), (1,))))  # [h, T, D]
    o_ref[...] = o.astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l))[..., 0]


def _bwd_kernel(q_ref, k_ref, v_ref, *rest, scale, has_bias, want_dbias=False):
    dbias_ref = None
    if has_bias and want_dbias:
        (bias_ref, o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref) = rest
    elif has_bias:
        (bias_ref, o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref) = rest
    else:
        (o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref) = rest
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    o = o_ref[...].astype(jnp.float32)
    do = do_ref[...]
    lse = lse_ref[0]

    s = _bdot(q, k, (((2,), (2,)))) * scale
    if has_bias:
        s = s + bias_ref[...][None]
    p = jnp.exp(s - lse[..., None])  # [h, T, T] fp32
    pb = p.astype(q.dtype)

    dv = _bdot(pb, do, (((1,), (1,))))  # [h, T, D] (contract over queries)
    dp = _bdot(do, v, (((2,), (2,))))  # [h, T, T]
    delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
    ds_raw = p * (dp - delta)  # ∂L/∂s (pre-scale: s = scale·qkᵀ + bias)
    ds = (ds_raw * scale).astype(q.dtype)
    dq = _bdot(ds, k, (((2,), (1,))))
    dk = _bdot(ds, q, (((1,), (1,))))
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)
    if dbias_ref is not None:  # accumulate across sequential grid steps
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

        dbias_ref[...] += jnp.sum(ds_raw, axis=0)


def _specs(T, D, hpb):
    head = pl.BlockSpec((hpb, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # lse lives as [num_blocks, hpb, T]: the (hpb, T) block equals the array's
    # trailing dims, which is always tile-legal (hpb may be < 8)
    lse = pl.BlockSpec((1, hpb, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return head, lse, bias


def _pick_hpb(BH: int, T: int, D: int) -> int:
    """Heads per grid step, bounded by a VMEM budget for the [h, T, T] fp32
    probability tensor."""
    import os

    budget = int(os.environ.get("VIPANT_ATTN_VMEM_MB", "8")) * 1024 * 1024
    max_hpb = int(os.environ.get("VIPANT_ATTN_HPB", "8"))
    per_head = T * T * 4 * 2 + 3 * T * D * 4
    hpb = max(1, min(max_hpb, budget // max(per_head, 1)))
    while BH % hpb != 0:
        hpb -= 1
    return max(hpb, 1)


def _fwd_call(q3, k3, v3, bias, scale):
    BH, T, D = q3.shape
    hpb = _pick_hpb(BH, T, D)
    head, lse, bias_spec = _specs(T, D, hpb)
    has_bias = bias is not None
    kernel = functools.partial(_fwd_kernel, scale=scale, has_bias=has_bias)
    args = (q3, k3, v3) + ((bias,) if has_bias else ())
    return pl.pallas_call(
        kernel,
        grid=(BH // hpb,),
        in_specs=[head] * 3 + ([bias_spec] if has_bias else []),
        out_specs=(head, lse),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, D), q3.dtype),
            jax.ShapeDtypeStruct((BH // hpb, hpb, T), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def _bwd_call(q3, k3, v3, bias, o3, lse, do3, scale, want_dbias=True):
    BH, T, D = q3.shape
    hpb = _pick_hpb(BH, T, D)
    head, lse_spec, bias_spec = _specs(T, D, hpb)
    has_bias = bias is not None
    want_dbias = want_dbias and has_bias
    kernel = functools.partial(
        _bwd_kernel, scale=scale, has_bias=has_bias, want_dbias=want_dbias
    )
    args = (q3, k3, v3) + ((bias,) if has_bias else ()) + (o3, lse, do3)
    out_specs = (head,) * 3 + ((bias_spec,) if want_dbias else ())
    out_shape = tuple(
        jax.ShapeDtypeStruct((BH, T, D), q3.dtype) for _ in range(3)
    ) + ((jax.ShapeDtypeStruct((T, T), jnp.float32),) if want_dbias else ())
    return pl.pallas_call(
        kernel,
        grid=(BH // hpb,),
        in_specs=[head] * 3
        + ([bias_spec] if has_bias else [])
        + [head, lse_spec, head],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


# ---------------------------------------------------------------------------
# 4-d variant: blocks [1, T, H, D] straight off the projection layout — the
# head transpose happens in VMEM, so XLA inserts no HBM relayout copies
# ---------------------------------------------------------------------------


def _fwd_kernel4(q_ref, k_ref, v_ref, *rest, scale, has_bias):
    if has_bias:
        bias_ref, o_ref, lse_ref = rest
    else:
        (o_ref, lse_ref) = rest
    # [T, H, D] → [H, T, D] in VMEM (Mosaic requires leading batch dims)
    q = jnp.swapaxes(q_ref[0], 0, 1)
    k = jnp.swapaxes(k_ref[0], 0, 1)
    v = jnp.swapaxes(v_ref[0], 0, 1)
    s = _bdot(q, k, (((2,), (2,)))) * scale  # [H, T, T] fp32
    if has_bias:
        s = s + bias_ref[...][None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = _bdot((p / l).astype(v.dtype), v, (((2,), (1,))))  # [H, T, D]
    o_ref[0] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l))[..., 0]


def _bwd_kernel4(q_ref, k_ref, v_ref, *rest, scale, has_bias):
    if has_bias:
        (bias_ref, o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref) = rest
    else:
        (o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref) = rest
    q = jnp.swapaxes(q_ref[0], 0, 1)
    k = jnp.swapaxes(k_ref[0], 0, 1)
    v = jnp.swapaxes(v_ref[0], 0, 1)
    o = jnp.swapaxes(o_ref[0], 0, 1).astype(jnp.float32)
    do = jnp.swapaxes(do_ref[0], 0, 1)
    lse = lse_ref[0]

    s = _bdot(q, k, (((2,), (2,)))) * scale
    if has_bias:
        s = s + bias_ref[...][None]
    p = jnp.exp(s - lse[..., None])
    pb = p.astype(q.dtype)
    dv = _bdot(pb, do, (((1,), (1,))))
    dp = _bdot(do, v, (((2,), (2,))))
    delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
    ds_raw = p * (dp - delta)
    ds = (ds_raw * scale).astype(q.dtype)
    dq = _bdot(ds, k, (((2,), (1,))))
    dk = _bdot(ds, q, (((1,), (1,))))
    dq_ref[0] = jnp.swapaxes(dq, 0, 1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.swapaxes(dk, 0, 1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.swapaxes(dv, 0, 1).astype(dv_ref.dtype)
    if has_bias:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

        dbias_ref[...] += jnp.sum(ds_raw, axis=0)


def _specs4(T, H, D):
    head = pl.BlockSpec((1, T, H, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((1, H, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return head, lse, bias


def _fits_vmem4(T, H, D, bytes_per=2, budget=12 * 1024 * 1024) -> bool:
    probs = H * T * T * 4 * 2  # s and p in fp32
    io = 5 * T * H * D * bytes_per
    return probs + io <= budget


def _fwd_call4(q4, k4, v4, bias, scale):
    B, T, H, D = q4.shape
    head, lse, bias_spec = _specs4(T, H, D)
    has_bias = bias is not None
    kernel = functools.partial(_fwd_kernel4, scale=scale, has_bias=has_bias)
    args = (q4, k4, v4) + ((bias,) if has_bias else ())
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[head] * 3 + ([bias_spec] if has_bias else []),
        out_specs=(head, lse),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, H, D), q4.dtype),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(*args)


def _bwd_call4(q4, k4, v4, bias, o4, lse, do4, scale):
    B, T, H, D = q4.shape
    head, lse_spec, bias_spec = _specs4(T, H, D)
    has_bias = bias is not None
    kernel = functools.partial(_bwd_kernel4, scale=scale, has_bias=has_bias)
    args = (q4, k4, v4) + ((bias,) if has_bias else ()) + (o4, lse, do4)
    out_specs = (head,) * 3 + ((bias_spec,) if has_bias else ())
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, T, H, D), q4.dtype) for _ in range(3)
    ) + ((jax.ShapeDtypeStruct((T, T), jnp.float32),) if has_bias else ())
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[head] * 3
        + ([bias_spec] if has_bias else [])
        + [head, lse_spec, head],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attend4(q4, k4, v4, bias, scale):
    out, _ = _fwd_call4(q4, k4, v4, bias, scale)
    return out


def _attend4_fwd(q4, k4, v4, bias, scale):
    out, lse = _fwd_call4(q4, k4, v4, bias, scale)
    return out, (q4, k4, v4, bias, out, lse)


def _attend4_bwd(scale, res, g):
    q4, k4, v4, bias, out, lse = res
    if bias is None:
        dq, dk, dv = _bwd_call4(q4, k4, v4, bias, out, lse, g, scale)
        return dq, dk, dv, None
    dq, dk, dv, dbias = _bwd_call4(q4, k4, v4, bias, out, lse, g, scale)
    return dq, dk, dv, dbias


_attend4.defvjp(_attend4_fwd, _attend4_bwd)


# ---------------------------------------------------------------------------
# public op with custom VJP (3-d fallback for long sequences)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attend(q3, k3, v3, bias, scale, bias_grad):
    out, _ = _fwd_call(q3, k3, v3, bias, scale)
    return out


def _attend_fwd(q3, k3, v3, bias, scale, bias_grad):
    out, lse = _fwd_call(q3, k3, v3, bias, scale)
    return out, (q3, k3, v3, bias, out, lse)


def _attend_bwd(scale, bias_grad, res, g):
    q3, k3, v3, bias, out, lse = res
    if bias is None:
        dq, dk, dv = _bwd_call(q3, k3, v3, bias, out, lse, g, scale)
        return dq, dk, dv, None
    if not bias_grad:  # constant mask: bias stays in the softmax recompute,
        # only the dbias accumulation output is skipped
        dq, dk, dv = _bwd_call(q3, k3, v3, bias, out, lse, g, scale, want_dbias=False)
        return dq, dk, dv, jnp.zeros_like(bias)
    dq, dk, dv, dbias = _bwd_call(q3, k3, v3, bias, out, lse, g, scale)
    return dq, dk, dv, dbias


_attend.defvjp(_attend_fwd, _attend_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    causal: bool = False,
    bias_grad: bool = True,
) -> jnp.ndarray:
    """q, k, v: [B, T, H, D] (``jax.nn.dot_product_attention`` layout);
    ``bias``: optional additive [T, T] (e.g. a causal mask). Returns
    [B, T, H, D]."""
    B, T, H, D = q.shape
    scale = 1.0 / float(np.sqrt(D))
    if causal:  # combines with an explicit bias rather than being dropped
        causal_bias = jnp.triu(jnp.full((T, T), NEG_INF, jnp.float32), k=1)
        bias = causal_bias if bias is None else bias.astype(jnp.float32) + causal_bias
    if bias is not None:
        bias = jnp.maximum(bias.astype(jnp.float32), NEG_INF)

    # NOTE: a strided-DMA variant that reads per-head [T, D] slices from the
    # [B, T, H, D] layout was tried and rejected: single-head slices are
    # tile-misaligned (H and D fold into the (16, 128) bf16 tile), which
    # Mosaic cannot DMA. The in-VMEM transpose variant below also measured
    # slower than paying the XLA relayout copies. 3-d path is the default.
    import os

    if os.environ.get("VIPANT_ATTN") == "4d" and _fits_vmem4(
        T, H, D, bytes_per=q.dtype.itemsize
    ):
        return _attend4(q, k, v, bias, scale)  # 4-d variant keeps full dbias

    def to3(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, T, D)

    out3 = _attend(to3(q), to3(k), to3(v), bias, scale, bias_grad)
    out = out3.reshape(B, H, T, D)
    return jnp.transpose(out, (0, 2, 1, 3))


def _flash_over_mesh(q, k, v, bias, bias_grad=True):
    """Partition the Pallas call over the mesh's data axis with shard_map —
    a custom call is opaque to GSPMD, so without this XLA would all-gather
    the sharded batch around it. (Mesh probing and the shard_map compat
    shim are shared with the fused kernel module.)"""
    from .fused_attn import _mesh_info, _smap

    mesh, _ = _mesh_info(heads=1)  # data-axis sharding only
    if mesh is None:
        return flash_attention(q, k, v, bias=bias, bias_grad=bias_grad)

    from jax.sharding import PartitionSpec as P

    data = P("data")
    if bias is None:
        fn = _smap(
            lambda a, b, c: flash_attention(a, b, c),
            mesh,
            in_specs=(data, data, data),
            out_specs=data,
        )
        return fn(q, k, v)
    fn = _smap(
        lambda a, b, c, bb: flash_attention(a, b, c, bias=bb, bias_grad=bias_grad),
        mesh,
        in_specs=(data, data, data, P()),
        out_specs=data,
    )
    return fn(q, k, v, bias)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
    bias_grad: bool = False,
) -> jnp.ndarray:
    """Dispatcher: the Pallas kernel on TPU (self-attention, equal lengths),
    XLA attention elsewhere. Biases reaching this entry point are constant
    masks (causal/padding, built in layers.py), so the flash backward skips
    the [T, T] dbias accumulation unless ``bias_grad=True``."""
    from ..parallel.sequence import ring_attention, seq_axis

    ax = seq_axis()
    if ax is not None:
        # token axis is sharded over the `seq` mesh axis (sequence
        # parallelism): per-device kernels would attend to local tokens
        # only — ring attention streams the key/value blocks around the
        # ring. Additive biases arrive as the local [.., T_local, T_global]
        # row shard of the global mask (StackedTransformer shards the rows).
        assert mask is None, (
            "ring attention takes additive biases, not boolean masks"
        )
        assert q.shape[1] == k.shape[1], "ring attention is self-attention"
        return ring_attention(q, k, v, ax, bias=bias)
    if use_flash is None:
        # Mosaic kernels lower on TPU only (GPU etc. use XLA attention)
        use_flash = (
            jax.default_backend() == "tpu"
            and q.shape[1] == k.shape[1]
            and mask is None
        )
    if use_flash:
        assert mask is None, (
            "the flash path has no boolean-mask support — fold the mask "
            "into an additive bias or leave use_flash unset"
        )
        bias2d = None
        if bias is not None:
            b = bias
            while b.ndim > 2:
                assert b.shape[0] == 1, "flash path expects a [T, T] bias"
                b = b[0]
            bias2d = b
        return _flash_over_mesh(q, k, v, bias2d, bias_grad=bias_grad)
    return jax.nn.dot_product_attention(q, k, v, bias=bias, mask=mask)
