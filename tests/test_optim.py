import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.config import Config
from vipant_tpu.optim import build_optimizer, warmup_cosine_lr, warmup_multistep_lr


def opt_cfg(**kw):
    base = {
        "use_lars": True,
        "name": "Adam",
        "warmup": True,
        "warmup_steps": 10,
        "warmup_epoch": 2,
        "lr": 1e-3,
        "weight_decay": 1e-6,
        "betas": [0.9, 0.999],
        "max_norm": 0.5,
        "lr_weight": 0.2,
        "lr_bias": 0.0048,
        "eta": 0.001,
        "batch_size": 256,
        "epochs": 10,
        "steps": [],
        "gamma": 0.5,
    }
    base.update(kw)
    return Config(base)


def test_cosine_schedule_shape():
    s = warmup_cosine_lr(1.0, total_steps=100, warmup_steps=10)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(55)) < 1.0
    assert float(s(100)) == pytest.approx(0.001, abs=1e-5)


def test_multistep_schedule():
    s = warmup_multistep_lr(1.0, warmup_steps=5, milestones_steps=(10, 20), gamma=0.5)
    assert float(s(0)) == pytest.approx(0.2)
    assert float(s(7)) == pytest.approx(1.0)
    assert float(s(15)) == pytest.approx(0.5)
    assert float(s(25)) == pytest.approx(0.25)


def _params():
    return {
        "w": jnp.ones((4, 4)),
        "b": jnp.zeros((4,)),
        "frozen": {"w": jnp.ones((2, 2))},
    }


def test_lars_descends():
    params = _params()
    tx, _ = build_optimizer(opt_cfg(), steps_per_epoch=10)
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2) + jnp.sum(p["frozen"]["w"] ** 2)

    losses = []
    for _ in range(20):
        g = jax.grad(loss_fn)(params)
        updates, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        losses.append(float(loss_fn(params)))
    assert losses[-1] < losses[0]


def test_freeze_mask():
    params = _params()
    mask = {"w": True, "b": True, "frozen": {"w": False}}
    tx, _ = build_optimizer(opt_cfg(use_lars=False), steps_per_epoch=10, tunable_mask=mask)
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(g, state, params)
    assert np.all(np.asarray(updates["frozen"]["w"]) == 0)
    assert np.any(np.asarray(updates["w"]) != 0)


def test_adam_path_descends():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx, _ = build_optimizer(
        opt_cfg(use_lars=False, warmup=False, lr=0.05), steps_per_epoch=10
    )
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((p["w"] - 0.5) ** 2)

    for _ in range(50):
        g = jax.grad(loss_fn)(params)
        updates, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert float(loss_fn(params)) < 0.5
