"""Engine-level int8-vs-bf16 numerics on the real TPU.

Builds the flagship audio tower twice in separate configs (the int8 switch
is process-global, so run this script twice) — or, with no argument, runs
BOTH paths by calling the kernels directly on identical weights and
reports per-clip embedding cosine. Usage:

    python experiments/quant_cosine.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import bench

    from vipant_tpu.optim.partition import merge_params

    B = int(os.environ.get("QC_BATCH", "64"))
    cfg, model, tx, step, state, trainable, frozen = bench.build(B)
    params = merge_params(state.params, state.frozen_params)
    rng = np.random.default_rng(0)
    audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)

    def embed(p, a):
        out = model.apply({"params": p}, a, method="encode_audio", train=False)
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(1e-8)

    outs = {}
    for mode in ("bf16", "int8"):
        os.environ["VIPANT_FUSED_MLP"] = "1"
        os.environ["VIPANT_INT8_MLP"] = "1" if mode == "int8" else "0"
        os.environ["VIPANT_INT8_ATTN"] = "1" if mode == "int8" else "0"
        outs[mode] = np.asarray(jax.jit(embed)(params, audios), np.float32)
        jax.clear_caches()  # the env switch is read at trace time

    a, b = outs["bf16"], outs["int8"]
    cos = (a * b).sum(-1)
    print(f"audio embedding cosine int8 vs bf16 (B={B}): "
          f"min {cos.min():.6f} mean {cos.mean():.6f}")


if __name__ == "__main__":
    main()
