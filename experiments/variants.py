"""Quick A/B timing of step variants on the real TPU.

Usage: python experiments/variants.py b64 noimgfuse b64
  bNN        — time the synthetic full step at batch NN (with the env
               toggles set so far)
  noimgfuse  — from here on, route short sequences (image tower T=50) to
               XLA attention (VIPANT_FUSED_MIN_T=100)
  nosaveqkv  — from here on, flash-style recompute backward
               (VIPANT_SAVE_QKV=0)
  fusedmlp   — from here on, fused MLP kernel (VIPANT_FUSED_MLP=1)

Toggles apply to every subsequent bNN, so `b64 noimgfuse b64` is an A/B.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def run(B):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    import bench

    cfg, model, tx, step, state, trainable, frozen = bench.build(B)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)
    audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)
    for _ in range(2):
        state, m = step(state, images, audios)
        float(m["loss"])
    STEPS = 20
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, images, audios)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"B={B}: {dt*1e3:.2f} ms/step -> {B/dt:.1f} clips/s")
    return B / dt


def main():
    os.makedirs("/tmp/jaxcache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    toggles = {
        "noimgfuse": ("VIPANT_FUSED_MIN_T", "100"),
        "nosaveqkv": ("VIPANT_SAVE_QKV", "0"),
        "fusedmlp": ("VIPANT_FUSED_MLP", "1"),
    }
    for v in sys.argv[1:]:
        if v.startswith("b") and v[1:].isdigit():
            run(int(v[1:]))
        elif v in toggles:
            k, val = toggles[v]
            os.environ[k] = val
            print(f"set {k}={val}")
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
