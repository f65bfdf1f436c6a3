"""Probe: fused qkv-projection + attention + out-projection Pallas kernel.

Round-1 left ~15 ms/step of XLA relayout copies around the attention head
transpose ([B,T,H,D] -> [B*H,T,D] and back, 4 tensors x 12 layers x fwd+bwd).
Idea: never materialize a head-major layout at all. One kernel per batch item:

  qkv_t [3C,T] = dot(Wqkv [C,3C], x [T,C])        # TT-orientation dot
  per head h (sublane-aligned 64-row slices of qkv_t):
    s  [T,T] = dot(q_h [D,T], k_h [D,T])           # TN
    p        = softmax(s)
    o_h [D,T]= dot(v_h [D,T], p [T,T], contract j) # NT
  out [T,C]  = dot(out_t [C,T], Wout [C,C])        # TN
    (+ optional in-kernel LN + residual later)

Everything is an MXU dot with varied contraction dims; head slices are
sublane slices (64 = 8x sublane tile, always aligned). This probe checks
(a) which dot_general orientations Mosaic accepts, (b) numerical parity of
the fused forward vs XLA, (c) wall-clock vs the round-1 path.

Usage:  python experiments/fused_block_probe.py check   # CPU interpret mode
        python experiments/fused_block_probe.py tpu     # real-TPU parity+timing
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, H, D = 768, 12, 64
T = 306
B = 64


# ---------------------------------------------------------------------------
# stage 1: which 2-d dot orientations does Mosaic take?
# ---------------------------------------------------------------------------


def _dot_variant_kernel(a_ref, b_ref, o_ref, *, dims):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (dims, ((), ())), preferred_element_type=jnp.float32
    )


def probe_dot_variants(interpret: bool):
    rng = np.random.default_rng(0)
    M, K, N = 256, 128, 384
    report = {}
    for name, (ashape, bshape, dims) in {
        "NN": ((M, K), (K, N), ((1,), (0,))),
        "NT": ((M, K), (N, K), ((1,), (1,))),
        "TN": ((K, M), (K, N), ((0,), (0,))),
        "TT": ((K, M), (N, K), ((0,), (1,))),
    }.items():
        a = rng.standard_normal(ashape).astype(jnp.bfloat16)
        b = rng.standard_normal(bshape).astype(jnp.bfloat16)
        want = jax.lax.dot_general(
            a.astype(np.float32), b.astype(np.float32), (dims, ((), ()))
        )
        try:
            got = pl.pallas_call(
                functools.partial(_dot_variant_kernel, dims=dims),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                interpret=interpret,
            )(a, b)
            err = float(jnp.max(jnp.abs(got - want)))
            report[name] = f"ok err={err:.3e}"
        except Exception as e:  # noqa: BLE001
            report[name] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
    return report


# ---------------------------------------------------------------------------
# stage 2: fused forward kernel (no LN/residual yet)
# ---------------------------------------------------------------------------


def _fused_fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, o_ref, lse_ref, *, scale):
    x = x_ref[0]  # [T, C]
    qkv = jax.lax.dot_general(
        wqkv_ref[...], x, ((((0,), (1,))), ((), ())), preferred_element_type=jnp.float32
    )  # [3C, T]
    qkv = (qkv + bqkv_ref[...]).astype(x.dtype)
    outs = []
    for h in range(H):
        q = qkv[h * D:(h + 1) * D]
        k = qkv[C + h * D:C + (h + 1) * D]
        v = qkv[2 * C + h * D:2 * C + (h + 1) * D]
        s = jax.lax.dot_general(
            q, k, ((((0,), (0,))), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [T(i), T(j)]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        lse_ref[0, h] = (m + jnp.log(l))[:, 0]
        pb = (p / l).astype(x.dtype)
        o_h = jax.lax.dot_general(
            v, pb, ((((1,), (1,))), ((), ())), preferred_element_type=jnp.float32
        )  # [D, T(i)]
        outs.append(o_h.astype(x.dtype))
    out_t = jnp.concatenate(outs, axis=0)  # [C, T]
    y = jax.lax.dot_general(
        out_t, wout_ref[...], ((((0,), (0,))), ((), ())), preferred_element_type=jnp.float32
    )  # [T, C]
    y = y + bout_ref[...]
    o_ref[0] = y.astype(o_ref.dtype)


def fused_fwd(x, wqkv, bqkv, wout, bout, interpret=False):
    Bx, Tx, Cx = x.shape
    scale = 1.0 / float(np.sqrt(D))
    x_spec = pl.BlockSpec((1, Tx, Cx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_fwd_kernel, scale=scale),
        grid=(Bx,),
        in_specs=[
            x_spec,
            const((Cx, 3 * Cx)),
            const((3 * Cx, 1)),
            const((Cx, Cx)),
            const((1, Cx)),
        ],
        out_specs=(x_spec, pl.BlockSpec((1, H, Tx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((Bx, Tx, Cx), x.dtype),
            jax.ShapeDtypeStruct((Bx, H, Tx), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wqkv, bqkv, wout, bout)


def xla_reference(x, wqkv, bqkv, wout, bout):
    qkv = jnp.einsum("btc,cm->btm", x.astype(jnp.float32), wqkv.astype(jnp.float32)) + bqkv[:, 0]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    def heads(z):
        return z.reshape(z.shape[0], z.shape[1], H, D).transpose(0, 2, 1, 3)
    q, k, v = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(D)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], C)
    return jnp.einsum("btc,cm->btm", o, wout.astype(jnp.float32)) + bout[0]


def make_inputs(seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((B, T, C)) * 0.5).astype(dtype)
    wqkv = (rng.standard_normal((C, 3 * C)) * C ** -0.5).astype(dtype)
    bqkv = (rng.standard_normal((3 * C, 1)) * 0.02).astype(np.float32)
    wout = (rng.standard_normal((C, C)) * C ** -0.5).astype(dtype)
    bout = (rng.standard_normal((1, C)) * 0.02).astype(np.float32)
    return x, wqkv, bqkv, wout, bout


def check(interpret=True):
    print("dot variants:", probe_dot_variants(interpret))
    x, wqkv, bqkv, wout, bout = make_inputs()
    out, lse = fused_fwd(x, wqkv, bqkv, wout, bout, interpret=interpret)
    want = xla_reference(x, wqkv, bqkv, wout, bout)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - want)))
    rel = err / float(jnp.max(jnp.abs(want)))
    print(f"fused fwd parity: max abs err {err:.4e} (rel {rel:.4e})")
    assert rel < 2e-2, "parity failure"


def bench_tpu():
    from vipant_tpu.ops.attention import flash_attention

    # device-resident inputs: numpy args would re-upload ~35 MB per call
    # through the remote tunnel and swamp the measurement
    x, wqkv, bqkv, wout, bout = map(jax.device_put, make_inputs())

    @jax.jit
    def current_path(x, wqkv, bqkv, wout, bout):
        qkv = (x @ wqkv + bqkv[:, 0].astype(x.dtype)).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        def heads(z):
            return z.reshape(B, T, H, D)
        o = flash_attention(heads(q), heads(k), heads(v))
        o = o.reshape(B, T, C)
        return o @ wout + bout[0].astype(x.dtype)

    @jax.jit
    def fused_path(x, wqkv, bqkv, wout, bout):
        out, _ = fused_fwd(x, wqkv, bqkv, wout, bout)
        return out

    NIT = 50

    def loop(fn):
        # keep the whole timing loop on-device: per-call dispatch over the
        # remote-TPU tunnel costs hundreds of ms and would swamp the kernel
        @jax.jit
        def run(x, wqkv, bqkv, wout, bout):
            def body(_, xc):
                out = fn(xc, wqkv, bqkv, wout, bout)
                return (0.9 * xc + 0.1 * out).astype(xc.dtype)
            return jax.lax.fori_loop(0, NIT, body, x)
        return run

    for name, fn in [("current", current_path.__wrapped__), ("fused", fused_path.__wrapped__)]:
        run = loop(fn)
        r = run(x, wqkv, bqkv, wout, bout)
        float(jnp.sum(r.astype(jnp.float32)))  # host read barrier
        t0 = time.perf_counter()
        r = run(x, wqkv, bqkv, wout, bout)
        float(jnp.sum(r.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / NIT
        print(f"{name}: {dt*1e3:.3f} ms/iter")

    # parity on TPU too
    out, _ = fused_fwd(x, wqkv, bqkv, wout, bout)
    want = current_path(x, wqkv, bqkv, wout, bout)
    rel = float(jnp.max(jnp.abs(out.astype(np.float32) - want.astype(np.float32)))) / float(
        jnp.max(jnp.abs(want.astype(np.float32)))
    )
    print(f"fused vs current rel err: {rel:.4e}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check(interpret=jax.default_backend() == "cpu")
    else:
        import os
        os.makedirs("/tmp/jaxcache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        check(interpret=False)
        bench_tpu()
