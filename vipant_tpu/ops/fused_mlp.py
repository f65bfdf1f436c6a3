"""Fused LayerNorm + MLP + residual Pallas kernel: x + proj(act(fc(LN(x)))).

The MLP's [T, 4C] intermediate (~120 MB/layer at the flagship shapes) is the
largest activation in the network; XLA materializes it in HBM in both
directions. This kernel keeps it in VMEM — one grid step per batch item:

    h [T,C]   = LN(x)·s + b         (fp32 stats)
    a [T,4C]  = h·Wfc + bfc         (full-width MXU dot)
    g         = act(a)              (QuickGELU or exact GELU)
    y [T,C]   = g·Wproj + bproj
    out       = x + y

The backward recomputes h/a/g from x and accumulates weight/LN grads
across the sequential grid (psummed over the data axis under a mesh).

Capability parity: CLIP's MLP(c_fc -> QuickGELU -> c_proj) with fp32-island
LayerNorm (`/root/reference/clip/model.py:163-200`); DeiT's exact-GELU
variant via ``act='gelu'``. Falls back off-TPU (see nn/layers.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attn import _dg, _ln_fwd, _mesh_info, _smap


def _act_fwd(a, act):
    if act == "quick_gelu":
        return a * jax.nn.sigmoid(1.702 * a)
    return jax.nn.gelu(a, approximate=False)


def _act_vjp(a, act):
    """d act(a) / d a, elementwise (fp32)."""
    if act == "quick_gelu":
        sig = jax.nn.sigmoid(1.702 * a)
        return sig * (1.0 + 1.702 * a * (1.0 - sig))
    # exact gelu: Phi(a) + a·phi(a)
    phi = jnp.exp(-0.5 * a * a) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    cdf = 0.5 * (1.0 + jax.lax.erf(a / jnp.sqrt(2.0)))
    return cdf + a * phi


def _fwd_kernel(x_ref, lns_ref, lnb_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref, o_ref, *, act):
    x = x_ref[0]  # [T, C]
    h = _ln_fwd(x, lns_ref[...], lnb_ref[...])[0]
    a = _dg(h, wfc_ref[...], ((1,), (0,))) + bfc_ref[...]  # [T, 4C] f32
    g = _act_fwd(a, act).astype(x.dtype)
    y = _dg(g, wproj_ref[...], ((1,), (0,))) + bproj_ref[...]  # [T, C]
    o_ref[0] = x + y.astype(x.dtype)


def _bwd_kernel(
    x_ref, lns_ref, lnb_ref, wfc_ref, wproj_ref, g_ref,
    dx_ref, dwfc_ref, dbfc_ref, dwproj_ref, dbproj_ref, dlns_ref, dlnb_ref,
    *, act, bfc_ref=None,
):
    x = x_ref[0]
    gy = g_ref[0]  # [T, C] incoming grad

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dwfc_ref, dbfc_ref, dwproj_ref, dbproj_ref, dlns_ref, dlnb_ref):
            r[...] = jnp.zeros_like(r)

    h, xhat, rstd = _ln_fwd(x, lns_ref[...], lnb_ref[...])
    a = _dg(h, wfc_ref[...], ((1,), (0,))) + bfc_ref[...]  # [T, 4C] f32
    gact = _act_fwd(a, act).astype(x.dtype)

    gy32 = gy.astype(jnp.float32)
    dbproj_ref[...] += jnp.sum(gy32, axis=0, keepdims=True)  # [1, C]
    dwproj_ref[...] += _dg(gact, gy, ((0,), (0,)))  # [4C, C]
    dg = _dg(gy, wproj_ref[...], ((1,), (1,)))  # [T, 4C] f32
    da = (dg * _act_vjp(a, act)).astype(x.dtype)  # [T, 4C]
    dbfc_ref[...] += jnp.sum(da.astype(jnp.float32), axis=0, keepdims=True)  # [1, 4C]
    dwfc_ref[...] += _dg(h, da, ((0,), (0,)))  # [C, 4C]
    dh = _dg(da, wfc_ref[...], ((1,), (1,)))  # [T, C] f32

    dlns_ref[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * lns_ref[...]
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    )
    dx_ref[0] = (dx + gy32).astype(dx_ref.dtype)


def _fwd_int8_kernel(
    x_ref, lns_ref, lnb_ref, wfc_ref, sfc_ref, bfc_ref,
    wproj_ref, sproj_ref, bproj_ref, o_ref, *, act, res=True,
):
    """Serving-only int8 variant: both MLP dots run int8×int8→int32 on the
    MXU (measured 1.26× over the bf16 kernel at B=256 — docs/performance.md).
    Activations are per-token dynamically quantized IN VMEM, which is what
    the XLA-level int8 path cannot do (its [T, 4C] quantize pass through HBM
    measured a 0.80× regression on the proj dot, experiments/int8_probe.py).
    Weights arrive pre-quantized per output column (w ≈ w_i8·scale)."""
    from .quant import quantize_rows

    x = x_ref[0]  # [T, C]
    h = _ln_fwd(x, lns_ref[...], lnb_ref[...])[0].astype(jnp.float32)
    hi, hs = quantize_rows(h)
    a = jnp.dot(hi, wfc_ref[...], preferred_element_type=jnp.int32)
    a = a.astype(jnp.float32) * hs * sfc_ref[...] + bfc_ref[...]  # [T, 4C]
    g = _act_fwd(a, act)
    gi, gs = quantize_rows(g)
    y = jnp.dot(gi, wproj_ref[...], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * gs * sproj_ref[...] + bproj_ref[...]  # [T, C]
    # res=False returns the bare MLP output (a per-shard PARTIAL under
    # tensor parallelism — psummed over `model` by the caller, which adds
    # the residual once)
    o_ref[0] = x + y.astype(x.dtype) if res else y.astype(x.dtype)


_VMEM_LIMIT = 110 * 1024 * 1024


def _const(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)


def _item(T, C):
    return pl.BlockSpec((1, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _fwd_call(x, lns, lnb, wfc, bfc, wproj, bproj, act):
    B, T, C = x.shape
    E = wfc.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act=act),
        grid=(B,),
        in_specs=[
            _item(T, C), _const((1, C)), _const((1, C)),
            _const((C, E)), _const((1, E)), _const((E, C)), _const((1, C)),
        ],
        out_specs=_item(T, C),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(x, lns, lnb, wfc, bfc, wproj, bproj)


def _bwd_call(x, lns, lnb, wfc, bfc, wproj, g, act):
    B, T, C = x.shape
    E = wfc.shape[1]
    kern = functools.partial(_bwd_kernel, act=act)

    def kernel(x_r, lns_r, lnb_r, wfc_r, bfc_r, wproj_r, g_r, *outs):
        kern(x_r, lns_r, lnb_r, wfc_r, wproj_r, g_r, *outs, bfc_ref=bfc_r)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            _item(T, C), _const((1, C)), _const((1, C)),
            _const((C, E)), _const((1, E)), _const((E, C)), _item(T, C),
        ],
        out_specs=(
            _item(T, C), _const((C, E)), _const((1, E)),
            _const((E, C)), _const((1, C)), _const((1, C)), _const((1, C)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((C, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
            jax.ShapeDtypeStruct((E, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(x, lns, lnb, wfc, bfc, wproj, g)


def _fwd_int8_call(x, lns, lnb, wfc_i8, sfc, bfc, wproj_i8, sproj, bproj, act,
                   res=True):
    B, T, C = x.shape
    E = wfc_i8.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_int8_kernel, act=act, res=res),
        grid=(B,),
        in_specs=[
            _item(T, C), _const((1, C)), _const((1, C)),
            _const((C, E)), _const((1, E)), _const((1, E)),
            _const((E, C)), _const((1, C)), _const((1, C)),
        ],
        out_specs=_item(T, C),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(x, lns, lnb, wfc_i8, sfc, bfc, wproj_i8, sproj, bproj)


def _fwd_sharded(x, lns, lnb, wfc, bfc, wproj, bproj, act):
    mesh, _ = _mesh_info(heads=1)  # data-axis sharding only
    if mesh is None:
        return _fwd_call(x, lns, lnb, wfc, bfc, wproj, bproj, act)
    from jax.sharding import PartitionSpec as P

    d, r = P("data"), P()
    fn = _smap(
        lambda *a: _fwd_call(*a, act),
        mesh,
        in_specs=(d, r, r, r, r, r, r),
        out_specs=d,
    )
    return fn(x, lns, lnb, wfc, bfc, wproj, bproj)


def _bwd_sharded(x, lns, lnb, wfc, bfc, wproj, g, act):
    mesh, _ = _mesh_info(heads=1)  # data-axis sharding only
    if mesh is None:
        return _bwd_call(x, lns, lnb, wfc, bfc, wproj, g, act)
    from jax.sharding import PartitionSpec as P

    d, r = P("data"), P()

    def local(*a):
        outs = _bwd_call(*a, act)
        dx, rest = outs[0], jax.lax.psum(outs[1:], axis_name="data")
        return (dx,) + tuple(rest)

    fn = _smap(
        local, mesh,
        in_specs=(d, r, r, r, r, r, d),
        out_specs=(d,) + (r,) * 6,
    )
    return fn(x, lns, lnb, wfc, bfc, wproj, g)


def _prep(x, lns, lnb, wfc, bfc, wproj, bproj):
    f32row = lambda v: v.astype(jnp.float32).reshape(1, -1)
    return (
        f32row(lns), f32row(lnb),
        wfc.astype(x.dtype), f32row(bfc),
        wproj.astype(x.dtype), f32row(bproj),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused(x, lns, lnb, wfc, bfc, wproj, bproj, act):
    ls, lb, wf, bf, wp, bp = _prep(x, lns, lnb, wfc, bfc, wproj, bproj)
    return _fwd_sharded(x, ls, lb, wf, bf, wp, bp, act)


def _fused_fwd(x, lns, lnb, wfc, bfc, wproj, bproj, act):
    return _fused(x, lns, lnb, wfc, bfc, wproj, bproj, act), (
        x, lns, lnb, wfc, bfc, wproj, bproj,
    )


def _fused_bwd(act, res, g):
    x, lns, lnb, wfc, bfc, wproj, bproj = res
    ls, lb, wf, bf, wp, _ = _prep(x, lns, lnb, wfc, bfc, wproj, bproj)
    dx, dwfc, dbfc, dwproj, dbproj, dlns, dlnb = _bwd_sharded(
        x, ls, lb, wf, bf, wp, g.astype(x.dtype), act
    )
    rs = lambda d, p: d.reshape(p.shape).astype(p.dtype)
    return (
        dx,
        rs(dlns, lns), rs(dlnb, lnb),
        dwfc.astype(wfc.dtype), rs(dbfc, bfc),
        dwproj.astype(wproj.dtype), rs(dbproj, bproj),
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ln_mlp_block(
    x: jnp.ndarray,
    lns: jnp.ndarray,
    lnb: jnp.ndarray,
    wfc: jnp.ndarray,
    bfc: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    act: str = "quick_gelu",
) -> jnp.ndarray:
    """x + proj(act(fc(LN(x)))). x: [B,T,C]; wfc: [C,E]; wproj: [E,C]."""
    return _fused(x, lns, lnb, wfc, bfc, wproj, bproj, act)


def fused_ln_mlp_block_int8(
    x: jnp.ndarray,
    lns: jnp.ndarray,
    lnb: jnp.ndarray,
    wfc: jnp.ndarray,
    bfc: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    act: str = "quick_gelu",
) -> jnp.ndarray:
    """Int8-MXU x + proj(act(fc(LN(x)))) — SERVING ONLY (no VJP; attempting
    to differentiate through it fails loudly). Weights are quantized
    per-output-column inside the jitted call (one cheap pass over weights,
    amortized over the batch); activations per-token in VMEM. Block output
    cosine vs the bf16 kernel ≥ 0.9999 at ViT-B shapes
    (tests/test_quant.py).

    Composes with tensor parallelism (the Megatron fc-column / proj-row
    split of `parallel.mesh.param_shardings`): each model-axis shard
    quantizes ITS weight slices locally in-jit and computes a partial MLP
    output on its E/tp hidden columns; partials psum over ``model`` and the
    residual is added once. Kill switch: ``VIPANT_TP_MLP=0``."""
    from .quant import quantize_cols

    f32row = lambda v: v.astype(jnp.float32).reshape(1, -1)
    E = wfc.shape[1]
    mesh, tp = _mesh_info(E, env_flag="VIPANT_TP_MLP")
    if mesh is None:
        wfc_i8, sfc = quantize_cols(wfc)
        wproj_i8, sproj = quantize_cols(wproj)
        return _fwd_int8_call(
            x, f32row(lns), f32row(lnb), wfc_i8, sfc, f32row(bfc),
            wproj_i8, sproj, f32row(bproj), act,
        )
    from jax.sharding import PartitionSpec as P

    d, r = P("data"), P()
    wspecs = (
        (P(None, "model"), P("model"), P("model", None), r)
        if tp > 1
        else (r, r, r, r)
    )

    def call(xs, ls, lb, wfc_, bfc_, wproj_, bproj_):
        # quantize the LOCAL slices: fc column scales are per-output-column
        # (identical to the unsharded scales); proj column scales reduce
        # over the local E/tp rows only (a finer, equally-valid grid)
        wfc_i8, sfc = quantize_cols(wfc_)
        wproj_i8, sproj = quantize_cols(wproj_)
        if tp == 1:
            return _fwd_int8_call(
                xs, ls, lb, wfc_i8, sfc, f32row(bfc_),
                wproj_i8, sproj, f32row(bproj_), act,
            )
        y = _fwd_int8_call(
            xs, ls, lb, wfc_i8, sfc, f32row(bfc_),
            wproj_i8, sproj, f32row(bproj_ / tp), act, res=False,
        )
        y = jax.lax.psum(y, axis_name="model")
        return xs + y.astype(xs.dtype)

    return _smap(
        call, mesh,
        in_specs=(d, r, r) + wspecs,
        out_specs=d,
    )(x, f32row(lns), f32row(lnb), wfc, bfc, wproj, bproj)


def fused_mlp_applicable(T: int, C: int, expansion: int, int8: bool = False) -> bool:
    # The bf16 kernel is incompatible with model-axis MLP weight sharding
    # (parallel.param_shardings): its shard_map declares weights replicated,
    # which would all-gather the Megatron-sharded fc/proj every step — let
    # GSPMD's sharded MLP run instead. The int8 forward kernel DOES compose
    # with TP (fused_ln_mlp_block_int8 declares the Megatron specs and
    # psums partials), so it stays applicable when the split divides E.
    E = C * expansion
    tp = 1
    try:
        import os

        import jax as _jax

        from ..parallel.spmd import is_manual

        mesh = _jax.sharding.get_abstract_mesh()
        if (
            mesh is not None
            and not getattr(mesh, "empty", True)
            # inside a shard_map body (is_manual) _mesh_info runs the plain
            # per-device kernel on the caller's already-local shapes — the
            # model-axis split/estimate below must not apply there
            and not is_manual(mesh)
            and "model" in mesh.axis_names
            and mesh.shape["model"] > 1
        ):
            if not (
                int8
                and E % mesh.shape["model"] == 0
                and os.environ.get("VIPANT_TP_MLP", "1") == "1"
            ):
                return False
            tp = mesh.shape["model"]
    except Exception:  # noqa: BLE001
        pass
    Tp = -(-T // 8) * 8
    El = E // tp  # per-shard hidden width under TP
    est = (
        3 * Tp * El * 4       # a, g, da
        + 4 * C * El * 4      # wfc/wproj (bf16) + f32 grad accumulators
        + 6 * Tp * C * 4
    )
    return est < 95 * 1024 * 1024
