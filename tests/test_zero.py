"""ZeRO-1 optimizer-state sharding (parallel/zero.py) on the 8-device CPU
mesh: sharded-moment steps must equal replicated steps exactly, moments must
actually live 1/N per device, checkpoints must round-trip, and the trainer
knob (``mesh.zero=true``) must drive it end-to-end.

The reference replicates the torch optimizer per GPU
(`/root/reference/cvap/optimizer/__init__.py`); the TPU formulation shards
the moments over the ``data`` axis via placement annotations (no hand-written
collectives — GSPMD derives reduce-scatter/all-gather).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from vipant_tpu.config import compose
from vipant_tpu.models import build_main_model, init_model
from vipant_tpu.optim import build_optimizer
from vipant_tpu.parallel import (
    constrain_to,
    make_mesh,
    replicate,
    shard_batch,
    state_placement,
    zero_shard_opt_state,
)
from vipant_tpu.train import TrainState, make_train_step

SMALL = [
    "+running=bimodal",
    "+model/image=vit_val",
    "+model/audio=vit_val",
    "+model/text=dummy",
    "+model/loss=ce",
    "+optimizer=standard",
    "+running/audio=default",
    "model.image.width=64",
    "model.image.embed_dim=32",
    "model.image.encoder.layers=2",
    "model.image.heads=4",
    "running.audio.max_len=100",
    "model.audio.pre_encoder.stride=[16,24]",
    "worker=CVAP",
]


def _setup(overrides=()):
    cfg = compose(SMALL + list(overrides))
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=10)
    rng = np.random.default_rng(0)
    B = 16
    images = rng.standard_normal((B, 3, 224, 224)).astype(np.float32)
    audios = rng.standard_normal((B, 1, 100, 128)).astype(np.float32)
    return model, variables, tx, images, audios


def _moment_shards_are_fractional(opt_state, n_devices):
    """At least one big moment leaf is sharded 1/N (shape check, not just
    sharding metadata)."""
    found = False
    for x in jax.tree_util.tree_leaves(opt_state):
        if isinstance(x, jax.Array) and x.ndim >= 1 and x.size >= (1 << 14):
            shard = x.addressable_shards[0].data
            if shard.size * n_devices == x.size:
                found = True
            assert shard.size <= x.size
    return found


@pytest.mark.parametrize("use_lars", [False, True])
def test_zero_step_matches_replicated(use_lars):
    """Two optimizer steps with data-sharded Adam/LARS moments must equal
    the replicated-state result (same grads, same updates)."""
    overrides = ["optimizer.use_lars=True"] if use_lars else []
    model, variables, tx, images, audios = _setup(overrides)
    step = make_train_step(model, tx, donate=False)

    mesh = make_mesh()
    n = mesh.devices.size
    with jax.sharding.set_mesh(mesh):
        params = replicate(variables["params"], mesh)
        bi, ba = shard_batch((images, audios), mesh)

        ref = TrainState.create(params, tx)
        ref, m_ref = step(ref, bi, ba)
        ref, _ = step(ref, bi, ba)

        z = TrainState.create(params, tx)
        z = z.replace(opt_state=zero_shard_opt_state(z.opt_state, mesh))
        assert _moment_shards_are_fractional(z.opt_state, n)
        zstep = make_train_step(
            model, tx, donate=False, constrain=constrain_to(state_placement(z))
        )
        z, m_z = zstep(z, bi, ba)
        z, _ = zstep(z, bi, ba)

    assert float(m_ref["loss"]) == pytest.approx(float(m_z["loss"]), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref.params), jax.tree_util.tree_leaves(z.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    # the output state kept its ZeRO placement (donation-stable) ...
    assert _moment_shards_are_fractional(z.opt_state, n)
    # ... and params stayed replicated
    p_leaf = jax.tree_util.tree_leaves(z.params)[0]
    assert p_leaf.addressable_shards[0].data.size == p_leaf.size


def test_zero_composes_with_model_axis():
    """On a 4x2 data x model mesh, a Megatron-sharded MLP kernel's moment
    keeps its model dim and takes data on the free dim."""
    from vipant_tpu.parallel import shard_params

    model, variables, tx, images, audios = _setup()
    mesh = make_mesh(data=4, model=2)
    with jax.sharding.set_mesh(mesh):
        params = shard_params(variables["params"], mesh, min_size=1 << 12)
        state = TrainState.create(params, tx)
        state = state.replace(opt_state=zero_shard_opt_state(state.opt_state, mesh))
    specs = {
        str(x.sharding.spec)
        for x in jax.tree_util.tree_leaves(state.opt_state)
        if isinstance(x, jax.Array) and isinstance(x.sharding, NamedSharding)
    }
    # at least one moment carries BOTH axes
    assert any("data" in s and "model" in s for s in specs), specs


def test_zero_checkpoint_roundtrip(tmp_path):
    """save/load of a ZeRO-sharded state restores values AND shardings."""
    from vipant_tpu.ckpt.orbax_io import load_checkpoint, save_checkpoint

    model, variables, tx, images, audios = _setup()
    step = make_train_step(model, tx, donate=False)
    mesh = make_mesh()
    with jax.sharding.set_mesh(mesh):
        params = replicate(variables["params"], mesh)
        state = TrainState.create(params, tx)
        state = state.replace(opt_state=zero_shard_opt_state(state.opt_state, mesh))
        zstep = make_train_step(
            model, tx, donate=False, constrain=constrain_to(state_placement(state))
        )
        bi, ba = shard_batch((images, audios), mesh)
        state, _ = zstep(state, bi, ba)
        save_checkpoint(str(tmp_path), 1, state)
        fresh = TrainState.create(params, tx)
        fresh = fresh.replace(opt_state=zero_shard_opt_state(fresh.opt_state, mesh))
        restored = load_checkpoint(os.path.join(str(tmp_path), "00000001"), fresh)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if isinstance(a, jax.Array) and a.ndim >= 1:
            # trailing-None specs (P('data') vs P('data', None)) are the
            # same placement
            assert a.sharding.is_equivalent_to(b.sharding, a.ndim), (
                a.sharding,
                b.sharding,
            )


def test_zero_trainer_knob(tmp_path):
    """mesh.zero=true drives ZeRO through the production trainer: moments
    sharded, training runs, resume works."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from data_synth import make_synth_va_index

    from vipant_tpu.train import build_monitor

    make_synth_va_index(str(tmp_path / "data"), "train", n=8, seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=dummy",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
        "model.image.width=64",
        "model.image.embed_dim=32",
        "model.image.encoder.layers=2",
        "model.image.heads=4",
        "running.audio.max_len=100",
        "model.audio.pre_encoder.stride=[16,24]",
        "worker=CVAP",
        "monitor=VAMonitor",
        "optimizer.use_lars=False",
        "optimizer.warmup=False",
        "num_proc=2",
        "mesh.data=8",
        "mesh.zero=True",
        f"running.data_root={tmp_path}/data",
        "running.data_name=train",
        "running.eval_name=train",
        "running.batch_size=8",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=True",
        "running.eval_samples=0",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
        "verbose=False",
    ])
    mon = build_monitor(cfg)
    assert mon.constrain_state is not None
    mon.learn()
    n = jax.device_count()
    assert _moment_shards_are_fractional(mon.state.opt_state, n)
    assert np.isfinite(float(mon.state.step)) and int(mon.state.step) > 0
