"""AT fine-tuning with gradient cache through the LATrainer — the
"+AT w/ GC" configuration end-to-end."""

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.train import build_monitor
from data_synth import make_synth_clotho

from test_trainers import TINY_MODEL


def test_la_trainer_with_grad_cache(tmp_path):
    make_synth_clotho(str(tmp_path), "clotho_dev", n=8, seconds=1.05)
    cfg = compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CLAP",
        "monitor=LAMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=clotho_dev",
        "running.test_name=",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=8",
        "running.grad_cache.alive=True",
        "running.grad_cache.chunk_size=2",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()
    report = mon.infer(mon.evalloader)
    assert "A->T" in report


def test_grad_cache_step_equals_plain_step(tmp_path):
    """Same data, same init: one GC step must match one plain step."""
    import jax
    import jax.numpy as jnp

    from vipant_tpu.models import build_main_model, init_model, tunable_mask
    from vipant_tpu.optim import build_optimizer
    from vipant_tpu.optim.partition import partition_params
    from vipant_tpu.train import TrainState, make_train_step
    from vipant_tpu.train.step import make_grad_cache_step

    cfg = compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CLAP",
        "running.batch_size=4",
        # bf16 reorders reductions between the two paths; equality is
        # exact in fp32 (verified to ~4e-7 on raw grads)
        "compute_dtype=float32",
    ])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    trainable, frozen = partition_params(variables["params"], mask)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=10)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((4, 1, 100, 128)), jnp.float32)
    text = np.zeros((4, 77), np.int32)
    text[:, 0], text[:, 1], text[:, 2] = 49406, 320, 49407
    text = jnp.asarray(text)

    def adapter(model, variables, batch, rngs):
        return model.apply(variables, *batch, retrieval=True, train=True, rngs=rngs)

    plain = make_train_step(model, tx, loss_adapter=adapter, donate=False)
    s0 = TrainState.create(trainable, tx, frozen_params=frozen)
    s1, m1 = plain(s0, audio, text)

    gc = make_grad_cache_step(model, tx, n_chunks=2)
    s0b = TrainState.create(trainable, tx, frozen_params=frozen)
    s2, m2 = gc(s0b, audio, text)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) for a, b in zip(l1, l2)
    )
    assert worst < 1e-5, worst


def test_va_grad_cache_with_uint8_and_on_device_audio(tmp_path):
    """GC composed with BOTH device frontends: uint8 image normalization and
    waveform->fbank, each applied per-chunk inside the cached encodes."""
    from data_synth import make_synth_va_index

    make_synth_va_index(str(tmp_path / "d"), "train", n=8, seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/d",
        "running.data_name=train",
        "running.eval_name=",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.audio.on_device=True",
        "running.image_uint8=True",
        "running.grad_cache.alive=True",
        "running.grad_cache.chunk_size=2",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.train_step is not None
    mon.epoch(0)


def test_grad_cache_with_batch_stats_raises(tmp_path):
    """An explicitly requested GC must not silently degrade on batch_stats
    models (ResNet towers)."""
    make_synth_clotho(str(tmp_path), "clotho_dev", n=4, seconds=1.05)
    cfg = compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CLAP",
        "monitor=LAMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=",
        "running.test_name=",
        "running.batch_size=4",
        "running.grad_cache.alive=True",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.has_batch_stats = True  # as a ResNet tower would set
    with pytest.raises(ValueError, match="batch_stats"):
        mon.build_optimizer()
