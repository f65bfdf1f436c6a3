"""Micro-probe: int8 MXU matmul throughput vs bf16 on the real TPU.

v5e's MXU runs int8xint8->int32 at ~2x the bf16 rate (394 vs 197 TOPS).
This probe times the serving path's dominant GEMM shapes (the MLP fc and
the qkv projection at audio-tower token counts) in three regimes:

  1. bf16 baseline              y = x @ w
  2. int8, pre-quantized weight y = dq(q8(x_row) @ w_i8)   (serving regime:
     weights quantized once at load; activations per-token dynamic)
  3. int8, fully dynamic        both quantized inside the jitted fn

If (2) does not beat (1) meaningfully, the int8 serving path is not worth
building on this stack (XLA lowering / tunnel may eat the win) — record
the numbers either way. Usage: python experiments/int8_probe.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decompose import timeit  # scan-chained device timing


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    B, T, C = 64, 306, 768
    N = B * T  # 19584 tokens
    r = np.random.default_rng(0)

    for (n, k, m, label) in [
        (N, C, 4 * C, "mlp fc   [BT,C]@[C,4C]"),
        (N, 4 * C, C, "mlp proj [BT,4C]@[4C,C]"),
        (N, C, 3 * C, "qkv      [BT,C]@[C,3C]"),
    ]:
        x = jnp.asarray(r.standard_normal((n, k)), jnp.bfloat16)
        w = jnp.asarray(r.standard_normal((k, m)) * 0.02, jnp.bfloat16)
        # pre-quantized weight (per-output-column symmetric)
        w32 = np.asarray(w, np.float32)
        ws = np.abs(w32).max(axis=0) / 127.0 + 1e-12
        w_i8 = jnp.asarray(np.clip(np.round(w32 / ws), -127, 127), jnp.int8)
        ws_j = jnp.asarray(ws, jnp.float32)

        flops = 2.0 * n * k * m

        @jax.jit
        def bf16(x, w):
            return x @ w

        # the production quantizer — so the probe measures the same math
        # the kernels run, not a private copy
        from vipant_tpu.ops.quant import quantize_rows as _rowq

        @jax.jit
        def int8_staticw(x, w_i8, ws):
            xi, xs = _rowq(x)
            acc = jax.lax.dot_general(
                xi, w_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * xs * ws[None, :]).astype(jnp.bfloat16)

        @jax.jit
        def int8_dynw(x, w):
            xi, xs = _rowq(x)
            aw = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
            s = aw / 127.0 + 1e-12
            wi = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xi, wi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * xs * s).astype(jnp.bfloat16)

        ms_bf = timeit(bf16, x, w)
        ms_i8 = timeit(int8_staticw, x, w_i8, ws_j)
        ms_dy = timeit(int8_dynw, x, w)
        print(f"{label}: bf16 {ms_bf:.3f} ms ({flops/ms_bf/1e9:.0f} GF/s) | "
              f"int8 staticw {ms_i8:.3f} ms ({flops/ms_i8/1e9:.0f} GF/s) | "
              f"int8 dynw {ms_dy:.3f} ms ({flops/ms_dy/1e9:.0f} GF/s)")


if __name__ == "__main__":
    main()
