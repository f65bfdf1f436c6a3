"""Pallas fused-attention kernel vs XLA attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vipant_tpu.ops.attention import flash_attention


def _qkv(rng, B=2, T=306, H=4, D=64):
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    return mk(), mk(), mk()


def _ref(q, k, v, bias=None):
    return jax.nn.dot_product_attention(q, k, v, bias=bias)


@pytest.mark.parametrize("T", [77, 128, 306])
def test_forward_matches_xla(rng, T):
    q, k, v = _qkv(rng, T=T)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v)
    ref = _ref(q, k, v)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 2e-5


def test_causal_matches_xla(rng):
    T = 77
    q, k, v = _qkv(rng, T=T)
    bias = jnp.triu(jnp.full((T, T), -jnp.inf, jnp.float32), k=1)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, bias=bias)
    ref = _ref(q, k, v, bias=bias[None, None])
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 2e-5


def test_gradients_match_xla(rng):
    q, k, v = _qkv(rng, B=1, T=130, H=2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 5e-4


def test_bias_gradient_matches_xla(rng):
    """The bias cotangent must be the true gradient, not zeros."""
    T = 77
    q, k, v = _qkv(rng, B=1, T=T, H=2)
    bias0 = jnp.asarray(0.1 * rng.standard_normal((T, T)), jnp.float32)

    def loss_flash(b):
        return jnp.sum(flash_attention(q, k, v, bias=b) ** 2)

    def loss_ref(b):
        return jnp.sum(_ref(q, k, v, bias=b[None, None]) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash)(bias0)
    g2 = jax.grad(loss_ref)(bias0)
    assert np.max(np.abs(np.asarray(g1) - np.asarray(g2))) < 5e-4


def test_bf16_io(rng):
    q, k, v = _qkv(rng, T=130)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(qb, kb, vb)
    assert out.dtype == jnp.bfloat16
    ref = _ref(q, k, v)
    assert np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref))) < 0.02
