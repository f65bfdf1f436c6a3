"""Serving throughput: fwd-only audio embedding on one chip.

Measures the inference path the serving engine uses
(`vipant_tpu/serve.py`: train=False encode, device-resident batches),
with and without the fwd-only fused MLP kernel (`VIPANT_FUSED_MLP=1`,
kept serving-only after it measured slower for training —
docs/performance.md). Prints one JSON line.

Usage: python experiments/serve_bench.py        (baseline XLA MLP)
       VIPANT_FUSED_MLP=1 python experiments/serve_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import bench

    STEPS = int(os.environ.get("SERVE_STEPS", "20"))
    out = {"fused_mlp": os.environ.get("VIPANT_FUSED_MLP") == "1"}
    rng = np.random.default_rng(0)
    for B in (int(b) for b in os.environ.get("SERVE_BATCH", "64,256").split(",")):
        cfg, model, tx, step, state, trainable, frozen = bench.build(B)
        from vipant_tpu.optim.partition import merge_params

        params = merge_params(state.params, state.frozen_params)

        @jax.jit
        def embed(p, a):
            return model.apply({"params": p}, a, method="encode_audio", train=False)

        audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)
        e = embed(params, audios)
        np.asarray(e[0, 0])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            e = embed(params, audios)
        np.asarray(e[0, 0])
        dt = (time.perf_counter() - t0) / STEPS
        out[f"b{B}_ms"] = round(dt * 1e3, 2)
        out[f"b{B}_clips_per_sec"] = round(B / dt, 1)
        print(f"serve B={B}: {dt*1e3:.1f} ms -> {B/dt:.0f} clips/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
