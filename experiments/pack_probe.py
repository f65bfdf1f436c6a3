"""Probe: pack K short sequences per fused-attention call (block-diagonal
bias) so the frozen image tower's T=50 stops wasting MXU sublane tiles.

Attention with an additive block-diagonal −inf bias over the packed halves
is EXACTLY separate attention (softmax rows never mix items), and
LN/projections/residual are token-wise — so packing is a pure layout
transform. The probe measures the fused LN+attention sub-block at the
image tower's shape (T=50, C=768, H=12) standard vs 2- and 4-packed, and
pins numerical equality.

Usage: python experiments/pack_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from decompose import timeit  # scan-chained device timing


def block_diag_bias(k: int, t: int):
    import numpy as np

    bias = np.full((k * t, k * t), -1e30, np.float32)
    for i in range(k):
        bias[i * t : (i + 1) * t, i * t : (i + 1) * t] = 0.0
    return bias


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from vipant_tpu.ops.fused_attn import fused_ln_attention_block

    B, T, C, H = 64, 50, 768, 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.float32)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wout = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.float32)
    bout = jnp.zeros((C,), jnp.float32)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)

    def run_std(x, w):
        return fused_ln_attention_block(x, lns, lnb, w, bqkv, wout, bout, heads=H)

    def make_packed(k):
        bias = jnp.asarray(block_diag_bias(k, T))

        def run(x, w):
            xp = x.reshape(B // k, k * T, C)
            y = fused_ln_attention_block(
                xp, lns, lnb, w, bqkv, wout, bout, bias=bias, heads=H
            )
            return y.reshape(B, T, C)

        return run

    # numerical equality (packing is exact)
    y0 = np.asarray(run_std(x, wqkv), np.float32)
    for k in (2, 4):
        yk = np.asarray(make_packed(k)(x, wqkv), np.float32)
        err = float(np.max(np.abs(y0 - yk)))
        print(f"pack{k} max |err| vs standard: {err:.3e}")

    ms0 = timeit(run_std, x, wqkv)
    print(f"image attn sub-block  standard (B={B}, T={T}):   {ms0:7.3f} ms")
    for k in (2, 4):
        msk = timeit(make_packed(k), x, wqkv)
        print(
            f"image attn sub-block  pack{k} (B={B//k}, T={k*T}):   {msk:7.3f} ms"
            f"  ({(ms0 - msk) / ms0 * 100:+.1f}%)"
        )
    print(f"12-layer tower saving upper bound @pack4: {(ms0 - msk) * 12:.2f} ms/step")


if __name__ == "__main__":
    main()
