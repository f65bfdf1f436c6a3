"""Micro-probe: projection matmul orientation on the real TPU.

The fused attention kernel computes qkv in TT orientation ([3C, T] output,
lane dim = T = 306 -> padded to 384, ~20% lane waste on the projection
dots) because head slices must land on sublane boundaries for the
attention stage. This probe times the same GEMM work in both orientations
plus the attention-dot shapes, to bound what a layout change could recover.

Usage: python experiments/proj_orient.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from decompose import timeit  # scan-chained device timing


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    B, T, C, H = 64, 306, 768, 12
    D = C // H
    r = np.random.default_rng(0)
    h_bt = jnp.asarray(r.standard_normal((B, T, C)), jnp.bfloat16)
    h_tt = jnp.asarray(r.standard_normal((B, C, T)), jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((C, 3 * C)) * 0.02, jnp.bfloat16)
    wt = w.T

    flops = 2 * B * T * C * 3 * C

    @jax.jit
    def row_major(h, w):  # [B*T, C] @ [C, 3C]: lanes = 3C, no lane waste
        return (h.reshape(B * T, C) @ w).reshape(B, T, 3 * C)

    @jax.jit
    def tt_orient(ht, wt):  # [3C, C] @ [C, T] per item: lanes = T = 306->384
        return jax.vmap(lambda x: wt @ x)(ht)

    ms_row = timeit(row_major, h_bt, w)
    ms_tt = timeit(tt_orient, h_tt, wt)
    print(f"qkv proj row-major [B*T,C]@[C,3C]: {ms_row:.3f} ms  "
          f"({flops/ms_row/1e9:.0f} GFLOP/s)")
    print(f"qkv proj TT [3C,C]@[C,T] vmap:     {ms_tt:.3f} ms  "
          f"({flops/ms_tt/1e9:.0f} GFLOP/s)")

    # attention-dot shapes (for reference): contract D=64, output [T, T]
    q = jnp.asarray(r.standard_normal((B * H, T, D)), jnp.bfloat16)
    k = jnp.asarray(r.standard_normal((B * H, T, D)), jnp.bfloat16)

    @jax.jit
    def score(q, k):
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )

    ms_s = timeit(score, q, k)
    sflops = 2 * B * H * T * T * D
    print(f"score dot [T,{D}]x[T,{D}]^T: {ms_s:.3f} ms ({sflops/ms_s/1e9:.0f} GFLOP/s)")


if __name__ == "__main__":
    main()
