"""Flash attention under a sharded mesh: the shard_map wrapping must produce
identical results to the unsharded kernel (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vipant_tpu.ops.attention import attention, flash_attention
from vipant_tpu.parallel import make_mesh, shard_batch


def test_sharded_flash_matches_unsharded(rng):
    B, T, H, D = 8, 130, 2, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        ref = flash_attention(q, k, v)

        mesh = make_mesh(data=4, model=1)
        with jax.sharding.set_mesh(mesh):
            qs, ks, vs = shard_batch((q, k, v), mesh)
            out = jax.jit(
                lambda a, b, c: attention(a, b, c, use_flash=True)
            )(qs, ks, vs)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 1e-5


def test_sharded_flash_with_bias(rng):
    B, T, H, D = 8, 77, 2, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    bias = jnp.triu(jnp.full((T, T), -1e30, jnp.float32), k=1)
    with pltpu.force_tpu_interpret_mode():
        ref = flash_attention(q, q, q, bias=bias)
        mesh = make_mesh(data=4, model=1)
        with jax.sharding.set_mesh(mesh):
            (qs,) = shard_batch((q,), mesh)
            out = jax.jit(
                lambda a: attention(a, a, a, bias=bias[None, None], use_flash=True)
            )(qs)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 1e-5
