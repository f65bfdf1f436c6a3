"""A/B the frozen image tower (T=50) forward: fused kernel vs XLA path.

Usage: python experiments/image_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decompose import timeit  # scan-chained device timing


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import bench

    B = 64
    cfg, model, tx, step, state, trainable, frozen = bench.build(B)
    from vipant_tpu.optim.partition import merge_params

    params = merge_params(state.params, state.frozen_params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)

    def image_fwd(i, p):
        return model.image.apply({"params": p}, i, train=False)

    os.environ["VIPANT_FUSED_MIN_T"] = "0"
    ms_kernel = timeit(image_fwd, images, params["image"])
    os.environ["VIPANT_FUSED_MIN_T"] = "100"  # route T=50 to XLA attention
    ms_xla = timeit(image_fwd, images, params["image"])
    print(f"image tower fwd  kernel path: {ms_kernel:7.2f} ms")
    print(f"image tower fwd  XLA path:    {ms_xla:7.2f} ms")

    # audio for reference with each setting (audio T=306 stays on kernel)
    audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)
    keys = {"dropout": jax.random.PRNGKey(0), "patchout": jax.random.PRNGKey(1)}

    def audio_fwd(a, p):
        return model.audio.apply({"params": p}, a, train=True, rngs=keys)

    ms_af = timeit(audio_fwd, audios, params["audio"])
    print(f"audio tower fwd (MIN_T=100):  {ms_af:7.2f} ms")


if __name__ == "__main__":
    main()
