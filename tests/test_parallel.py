"""Sharding + grad-cache tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.models import build_main_model, example_batch, init_model, tunable_mask
from vipant_tpu.nn.losses import CELossHead, cross_entropy, l2_normalize
from vipant_tpu.optim import build_optimizer
from vipant_tpu.parallel import grad_cache_value_and_grad, make_mesh, replicate, shard_batch
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


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model", "pipe", "seq")


def test_sharded_train_step_matches_single_device():
    """One optimizer step on an 8-way sharded batch must equal the
    replicated single-device result (global-negative semantics)."""
    cfg = compose(SMALL)
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=10, tunable_mask=mask)

    rng = np.random.default_rng(0)
    B = 16
    images = rng.standard_normal((B, 3, 224, 224)).astype(np.float32)
    audios = rng.standard_normal((B, 1, 100, 128)).astype(np.float32)

    step = make_train_step(model, tx, donate=False)

    # single device
    state0 = TrainState.create(variables["params"], tx)
    state1, m1 = step(state0, jnp.asarray(images), jnp.asarray(audios))

    # 8-device mesh, batch sharded
    mesh = make_mesh()
    with jax.sharding.set_mesh(mesh):
        params_r = replicate(variables["params"], mesh)
        state0m = TrainState.create(params_r, tx)
        bi, ba = shard_batch((images, audios), mesh)
        state2, m2 = step(state0m, bi, ba)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    # params after one step agree
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) for a, b in zip(l1, l2))
    assert worst < 1e-4, worst


def test_grad_cache_matches_direct():
    """Gradient cache must produce the same loss and grads as the direct
    (single-pass) computation."""
    d, b = 8, 16
    rng = np.random.default_rng(0)
    wa = rng.standard_normal((4, d)).astype(np.float32)
    wb = rng.standard_normal((4, d)).astype(np.float32)
    xa = rng.standard_normal((b, 4)).astype(np.float32)
    xb = rng.standard_normal((b, 4)).astype(np.float32)
    params = {
        "enc_a": jnp.asarray(wa),
        "enc_b": jnp.asarray(wb),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }

    def encode_a(p, x, idx):
        return l2_normalize(jnp.tanh(x @ p["enc_a"]))

    def encode_b(p, x, idx):
        return l2_normalize(jnp.tanh(x @ p["enc_b"]))

    def loss_of_embs(p, ea, eb):
        logits = jnp.exp(p["logit_scale"]) * ea @ eb.T
        labels = jnp.arange(ea.shape[0])
        return cross_entropy(logits, labels) + cross_entropy(logits.T, labels)

    def direct(p):
        return loss_of_embs(p, encode_a(p, xa, 0), encode_b(p, xb, 0))

    loss_d, grads_d = jax.value_and_grad(direct)(params)

    gc = grad_cache_value_and_grad(encode_a, encode_b, loss_of_embs, n_chunks=4)
    loss_c, grads_c = jax.jit(gc)(params, jnp.asarray(xa), jnp.asarray(xb))

    assert float(loss_d) == pytest.approx(float(loss_c), rel=1e-5)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(grads_d[k]), np.asarray(grads_c[k]), rtol=1e-4, atol=1e-5
        )


def test_grad_cache_sharded():
    """Grad cache under the 8-device mesh still runs and matches."""
    d, b = 8, 16
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.standard_normal((4, d)).astype(np.float32))}
    xa = rng.standard_normal((b, 4)).astype(np.float32)
    xb = rng.standard_normal((b, 4)).astype(np.float32)

    enc = lambda p, x, idx: l2_normalize(x @ p["w"])

    def loss_of_embs(p, ea, eb):
        logits = 10.0 * ea @ eb.T
        labels = jnp.arange(ea.shape[0])
        return cross_entropy(logits, labels)

    gc = jax.jit(grad_cache_value_and_grad(enc, enc, loss_of_embs, n_chunks=2))
    loss_ref, _ = gc(params, jnp.asarray(xa), jnp.asarray(xb))

    mesh = make_mesh()
    with jax.sharding.set_mesh(mesh):
        pa = replicate(params, mesh)
        sa, sb = shard_batch((xa, xb), mesh)
        loss_m, grads_m = gc(pa, sa, sb)
    assert float(loss_ref) == pytest.approx(float(loss_m), rel=1e-5)


def test_data_shard_info(monkeypatch):
    """Host-side dataset sharding coordinates: the data-shard GROUP, not
    the raw process id. Processes whose devices replicate the data axis
    (model/pipe spanning hosts) must land in the same group and load
    identical batches; shard_batch scales the global row count by the
    group count (vipant_tpu/parallel/mesh.py:data_shard_info)."""
    from vipant_tpu.parallel import data_shard_info

    # single process: trivially (0, 1) on any mesh
    assert data_shard_info(make_mesh(data=4, model=2, pipe=1, seq=1)) == (0, 1)

    class FakeDev:
        def __init__(self, pid):
            self.process_index = pid

    class FakeMesh:
        def __init__(self, grid):
            self.devices = grid

    def grid(data, rest, pid_of):
        g = np.empty((data, rest, 1, 1), object)
        for i in range(data):
            for j in range(rest):
                g[i, j, 0, 0] = FakeDev(pid_of(i, j))
        return g

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    # data=8 over 2 hosts x 4 chips: each host owns 4 data coords -> the
    # usual (pid, nproc) case
    mesh = FakeMesh(grid(8, 1, lambda i, j: i // 4))
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert data_shard_info(mesh) == (0, 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert data_shard_info(mesh) == (1, 2)

    # data=1, model=8 over 2 hosts: the data axis replicates over both
    # processes -> ONE shard group; both hosts must load the same batch
    mesh = FakeMesh(grid(1, 8, lambda i, j: j // 4))
    for pid in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        assert data_shard_info(mesh) == (0, 1)

    # data=2 x model=4 over 2 hosts, model split across hosts per data row:
    # both hosts own BOTH data coords -> one group again (replicated rows)
    mesh = FakeMesh(grid(2, 4, lambda i, j: j // 2))
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert data_shard_info(mesh) == (0, 1)
