"""Decomposed on-TPU timings of the flagship train step's pieces.

Times each sub-computation with a scan-chained jit loop (only a scalar
crosses the remote tunnel), to locate the real cost centers before
optimizing. Usage: python experiments/decompose.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(c, _):
            # perturb EVERY floating array arg with the carry: an arg left
            # loop-invariant lets XLA hoist everything that depends only on
            # it out of the scan (measured: the full-loss fwd probe read
            # 10.4 ms with audios invariant vs the honest 48 ms)
            pert = [
                x + (c * 1e-30).astype(x.dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x
                for x in a
            ]
            out = fn(*pert)
            s = sum(
                jnp.sum(x).astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(out)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            )
            return s * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=steps)
        return c

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import bench

    B = int(os.environ.get("DECOMP_B", "64"))
    cfg, model, tx, step, state, trainable, frozen = bench.build(B)
    from vipant_tpu.optim.partition import merge_params

    params = merge_params(state.params, state.frozen_params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)
    audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)
    keys = {"dropout": jax.random.PRNGKey(0), "patchout": jax.random.PRNGKey(1)}

    audio_tower = model.audio

    def audio_fwd(a, p):
        return audio_tower.apply({"params": p}, a, train=True, rngs=keys)

    def audio_loss(a, p):
        return jnp.sum(audio_fwd(a, p) ** 2)

    ag = jax.grad(audio_loss, argnums=1)

    def image_fwd(i, p):
        return model.image.apply({"params": p}, i, train=False)

    # patchify + embed only (pre_encoder path of the audio tower)
    from vipant_tpu.ops.patches import extract_patches

    print(f"B={B}", flush=True)  # print as measured: an OOM on a later,
    # wider piece must not discard the earlier timings
    ms_audio_f = timeit(audio_fwd, audios, params["audio"])
    print(f"audio tower fwd:        {ms_audio_f:7.2f} ms", flush=True)
    ms_audio_g = timeit(ag, audios, params["audio"])
    print(f"audio tower grad:       {ms_audio_g:7.2f} ms", flush=True)
    ms_image_f = timeit(image_fwd, images, params["image"])
    print(f"image tower fwd:        {ms_image_f:7.2f} ms", flush=True)

    def patch_only(a):
        x = jnp.transpose(a, (0, 2, 3, 1))  # [B, T, M, 1]
        return extract_patches(x, (16, 16), (16, 24))

    ms_patch = timeit(patch_only, audios)
    print(f"audio patch extract:    {ms_patch:7.2f} ms", flush=True)

    def full_loss(i, a, p):
        out = model.apply({"params": p}, i, a, train=True, rngs=keys)
        return out[0] if isinstance(out, tuple) else out

    ms_full_f = timeit(full_loss, images, audios, params)
    print(f"full loss fwd:          {ms_full_f:7.2f} ms", flush=True)
    g2 = jax.grad(
        lambda i, a, tp, fp: full_loss(i, a, merge_params(tp, fp)), argnums=2
    )
    ms_full_g = timeit(g2, images, audios, state.params, state.frozen_params)
    print(f"full grad:              {ms_full_g:7.2f} ms", flush=True)

    def opt_update(g, s):
        return tx.update(g, s.opt_state, s.params)

    try:
        grads = g2(images, audios, state.params, state.frozen_params)
        ms_opt = timeit(opt_update, grads, state)
        print(f"optimizer update:       {ms_opt:7.2f} ms", flush=True)
    except Exception as e:  # the extra live grads pytree can OOM at B>=96
        print(f"optimizer update: skipped ({type(e).__name__})", flush=True)


if __name__ == "__main__":
    main()
