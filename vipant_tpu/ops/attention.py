"""Fused attention Pallas kernel (forward + backward) for TPU.

At VIP-ANT sequence lengths (audio ≤ ~550 patch tokens, text 77 —
`/root/reference/cvap/module/encoder/audio_head.py:28-40` grid math), the
entire per-head [T, T] logit matrix fits in VMEM. XLA's unfused attention
writes the fp32 logits and probabilities to HBM every layer (~300 MB/layer
at batch 64); this kernel keeps logits, softmax and the PV product entirely
in VMEM — one HBM read of q/k/v, one write of the output. The backward
kernel recomputes probabilities from the saved logsumexp (flash-attention
style) so nothing quadratic is ever stored.

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


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# kernels: grid is (batch*heads,); blocks are whole [T, D] per head
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[...]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


def _bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, scale
):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[...]
    p = jnp.exp(s - lse[:, None])

    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _head_spec(T, D):
    return pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _bias_spec(T):
    return pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _lse_spec(T):
    # [BH, 1, T]: the (1, T) trailing block equals the full trailing dims,
    # satisfying TPU tile constraints
    return pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _fwd_call(q3, k3, v3, bias, scale):
    BH, T, D = q3.shape
    kernel = functools.partial(_fwd_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[_head_spec(T, D)] * 3 + [_bias_spec(T)],
        out_specs=(_head_spec(T, D), _lse_spec(T)),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, D), q3.dtype),
            jax.ShapeDtypeStruct((BH, 1, T), jnp.float32),
        ),
    )(q3, k3, v3, bias)


def _bwd_call(q3, k3, v3, bias, o3, lse, do3, scale):
    BH, T, D = q3.shape
    kernel = functools.partial(_bwd_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[_head_spec(T, D)] * 3
        + [_bias_spec(T), _head_spec(T, D), _lse_spec(T), _head_spec(T, D)],
        out_specs=(_head_spec(T, D),) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((BH, T, D), q3.dtype) for _ in range(3)),
    )(q3, k3, v3, bias, o3, lse, do3)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attend(q3, k3, v3, bias, scale, T_real, T_pad):
    out, _ = _fwd_call(q3, k3, v3, bias, scale)
    return out


def _attend_fwd(q3, k3, v3, bias, scale, T_real, T_pad):
    out, lse = _fwd_call(q3, k3, v3, bias, scale)
    return out, (q3, k3, v3, bias, out, lse)


def _attend_bwd(scale, T_real, T_pad, res, g):
    q3, k3, v3, bias, out, lse = res
    dq, dk, dv = _bwd_call(q3, k3, v3, bias, out, lse, g, scale)
    return dq, dk, dv, None


_attend.defvjp(_attend_fwd, _attend_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """q, k, v: [B, T, H, D] (``jax.nn.dot_product_attention`` layout);
    ``bias``: optional additive [T, T] (e.g. a causal mask). Returns
    [B, T, H, D]."""
    B, T, H, D = q.shape
    scale = 1.0 / float(np.sqrt(D))
    T_pad = max(_pad_to(T, 128), 128)
    D_pad = max(_pad_to(D, 128), 128)

    full_bias = jnp.full((T_pad, T_pad), 0.0, jnp.float32)
    if bias is not None:
        full_bias = full_bias.at[:T, :T].set(
            jnp.maximum(bias.astype(jnp.float32), NEG_INF)
        )
    if causal and bias is None:
        causal_mask = jnp.triu(jnp.full((T, T), NEG_INF, jnp.float32), k=1)
        full_bias = full_bias.at[:T, :T].set(causal_mask)
    if T_pad != T:  # padded keys must never receive attention
        full_bias = full_bias.at[:, T:].set(NEG_INF)

    def to3(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, T, D)
        if T_pad != T or D_pad != D:
            x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, D_pad - D)))
        return x

    out3 = _attend(to3(q), to3(k), to3(v), full_bias, scale, T, T_pad)
    out = out3[:, :T, :D].reshape(B, H, T, D)
    return jnp.transpose(out, (0, 2, 1, 3))


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatcher: the Pallas kernel on TPU (self-attention, equal lengths),
    XLA attention elsewhere."""
    if use_flash is None:
        use_flash = (
            jax.default_backend() not in ("cpu",)
            and q.shape[1] == k.shape[1]
            and mask is None
        )
    if use_flash:
        bias2d = None
        if bias is not None:
            b = bias
            while b.ndim > 2:
                assert b.shape[0] == 1, "flash path expects a [T, T] bias"
                b = b[0]
            bias2d = b
        return flash_attention(q, k, v, bias=bias2d)
    return jax.nn.dot_product_attention(q, k, v, bias=bias, mask=mask)
