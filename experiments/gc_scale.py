"""Gradient-cache at scale on the real chip: max contrastive batch + cost.

The reference's released "+AT w/ GC" checkpoints were trained with gradient
caching to scale the contrastive batch beyond activation memory
(`/root/reference/README.md:36,43`; the implementation itself is absent
from its code — SURVEY.md §2.8). This probe measures, on one chip, for the
flagship CVAP step (frozen ViT-B/32 image tower + trainable audio tower):

1. the largest batch the PLAIN step fits (activation memory grows with B),
2. GC throughput at batches far past that boundary (activations live for
   one chunk at a time; the B×B similarity matrix still gets exact global
   negatives),
3. per-clip cost of the extra re-forward pass.

Usage: python experiments/gc_scale.py   (TPU; ~5 min incl. compiles)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def hbm_gb():
    import jax

    try:
        s = jax.local_devices()[0].memory_stats()
        return s.get("peak_bytes_in_use", 0) / 1e9
    except Exception:
        return float("nan")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import bench
    from vipant_tpu.train.step import make_grad_cache_step

    STEPS = int(os.environ.get("GC_STEPS", "5"))
    results = {}

    def batch_for(B, rng):
        images = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)
        audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)
        return images, audios

    def timed(step, state, images, audios):
        state, m = step(state, images, audios)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, images, audios)
        float(m["loss"])
        return (time.perf_counter() - t0) / STEPS, state

    rng = np.random.default_rng(0)

    # --- plain step: walk B upward until compile/alloc fails -------------
    plain_best = None
    for B in (128, 256, 512, 1024):
        try:
            cfg, model, tx, step, state, trainable, frozen = bench.build(B)
            images, audios = batch_for(B, rng)
            dt, _ = timed(step, state, images, audios)
            plain_best = (B, dt)
            log(f"plain B={B}: {dt*1e3:.1f} ms/step -> {B/dt:.0f} clips/s  (peak HBM {hbm_gb():.1f} GB)")
            del state, images, audios
        except Exception as e:
            log(f"plain B={B}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            break
    results["plain_max_batch"], results["plain_ms"] = plain_best[0], plain_best[1] * 1e3

    # --- GC step: batches past the plain boundary ------------------------
    chunk = int(os.environ.get("GC_CHUNK", "128"))
    for B in (512, 1024, 2048, 4096):
        try:
            cfg, model, tx, step0, state, trainable, frozen = bench.build(B)
            n_chunks = B // chunk
            gc_step = make_grad_cache_step(
                model, tx, n_chunks, "encode_image", "encode_audio"
            )
            images, audios = batch_for(B, rng)
            dt, _ = timed(gc_step, state, images, audios)
            log(
                f"gc    B={B} ({n_chunks}x{chunk}): {dt*1e3:.1f} ms/step -> "
                f"{B/dt:.0f} clips/s  (peak HBM {hbm_gb():.1f} GB)"
            )
            results[f"gc_{B}_clips_per_sec"] = B / dt
            del state, images, audios
        except Exception as e:
            log(f"gc    B={B}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            break

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
