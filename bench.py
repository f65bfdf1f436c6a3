"""Benchmark: VA pre-training throughput (audio clips/sec/chip).

Runs the flagship CVAP training step (ViT-B/32 image tower frozen +
rectangular-grid audio tower + InfoNCE, LARS) on the available device,
steady-state, batch resident on device. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vipant_tpu.config import compose
    from vipant_tpu.models import build_main_model, init_model, tunable_mask
    from vipant_tpu.optim import build_optimizer
    from vipant_tpu.optim.partition import partition_params
    from vipant_tpu.train import TrainState, make_train_step

    B = int(os.environ.get("BENCH_BATCH", "64"))
    STEPS = int(os.environ.get("BENCH_STEPS", "20"))

    cfg = compose([
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=dummy",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
        "model.audio.pre_encoder.stride=[16,24]",
        "worker=CVAP",
        f"running.batch_size={B}",
    ])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    trainable, frozen = partition_params(variables["params"], mask)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=1000)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)
    audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)

    step = make_train_step(model, tx, donate=True)
    state = TrainState.create(trainable, tx, frozen_params=frozen)

    # compile + warmup; NOTE: timings use a host read (float()) of the last
    # step's loss — through the remote-device relay, block_until_ready
    # acknowledges before execution finishes, so only a D2H read is an
    # honest barrier.
    state, metrics = step(state, images, audios)
    float(metrics["loss"])
    state, metrics = step(state, images, audios)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, images, audios)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS

    n_chips = max(jax.device_count(), 1)
    clips_per_sec_per_chip = B / dt / n_chips

    # baseline: reference repo publishes no throughput number
    # (BASELINE.md); compare against the previous round's record if present.
    vs = 1.0
    prev = None
    for i in range(9, 0, -1):
        p = os.path.join(os.path.dirname(__file__), f"BENCH_r{i}.json")
        if os.path.exists(p):
            try:
                prev = json.load(open(p)).get("value")
            except Exception:
                prev = None
            if prev:
                break
    if prev:
        vs = clips_per_sec_per_chip / float(prev)

    print(
        json.dumps(
            {
                "metric": "va_pretrain_clips_per_sec_per_chip",
                "value": round(clips_per_sec_per_chip, 2),
                "unit": "clips/s/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
