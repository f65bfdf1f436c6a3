"""Three parallel axes in ONE mesh (data=2 × model=2 × pipe=2) on the
virtual 8-device CPU mesh. pipe and model cannot shard the SAME trunk (a
pipelined stage runs per-device — parallel/pipeline.py composition note),
so the composition is per-tower: the image trunk is layer-stacked and
pipelined over ``pipe``, the audio tower's weights are Megatron/head-block
sharded over ``model``, the batch shards over ``data``, and ZeRO-1 shards
the optimizer moments over ``data`` on top. The reference scales only by
data parallelism (`/root/reference/train.py:17-35`); this is the rebuild's
pod-scale composition, previously proven only pairwise with ``data``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.models import build_main_model, init_model, tunable_mask
from vipant_tpu.optim import build_optimizer
from vipant_tpu.optim.partition import merge_params, partition_params
from vipant_tpu.parallel import (
    adapt_trunk_layout,
    constrain_to,
    make_mesh,
    shard_batch,
    shard_params,
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
    "compute_dtype=float32",
]


def test_three_axis_step_matches_plain():
    """One train step on the 2×2×2 data×model×pipe mesh with ZeRO-1 == the
    plain single-device step: same loss, pipe-sharded image trunk leaves,
    model-sharded audio attention/MLP weights (1/2 local bytes), and
    data-sharded optimizer moments — all at once."""
    cfg = compose(SMALL)
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    trainable, frozen = partition_params(variables["params"], mask)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=10)

    rng = np.random.default_rng(0)
    B = 4
    images = rng.standard_normal((B, 3, 224, 224)).astype(np.float32)
    audios = rng.standard_normal((B, 1, 100, 128)).astype(np.float32)

    step = make_train_step(model, tx, donate=False)
    s0 = TrainState.create(trainable, tx, frozen_params=frozen)
    s1, m1 = step(s0, jnp.asarray(images), jnp.asarray(audios))

    cfg3 = compose(SMALL + ["mesh.pipe=2", "model.image.stacked=true"])
    model3 = build_main_model(cfg3)
    vars3 = init_model(cfg3, model3)
    params3 = adapt_trunk_layout(variables["params"], vars3["params"])
    mask3 = tunable_mask(cfg3, params3)
    train3, frozen3 = partition_params(params3, mask3)

    mesh = make_mesh(data=2, model=2, pipe=2)
    heads = {"image": 4, "audio": int(cfg.model.audio.heads)}
    with jax.sharding.set_mesh(mesh):
        t3 = shard_params(train3, mesh, min_size=1 << 10, attn_heads=heads)
        f3 = shard_params(frozen3, mesh, min_size=1 << 10, attn_heads=heads)
        st3 = TrainState.create(t3, tx, frozen_params=f3)
        st3 = st3.replace(
            opt_state=zero_shard_opt_state(st3.opt_state, mesh, min_size=1 << 10)
        )
        bi, ba = shard_batch((images, audios), mesh)
        step3 = make_train_step(
            model3, tx, donate=False, constrain=constrain_to(state_placement(st3))
        )
        st3, m3 = step3(st3, bi, ba)

    assert float(m1["loss"]) == pytest.approx(float(m3["loss"]), rel=2e-4)

    merged = merge_params(t3, f3)
    flat = jax.tree_util.tree_flatten_with_path(merged)[0]
    pipe_leaves = [
        (jax.tree_util.keystr(p), l)
        for p, l in flat
        if "['blocks']" in jax.tree_util.keystr(p)
    ]
    assert pipe_leaves, "no pipelined trunk leaves"
    for name, leaf in pipe_leaves:
        assert tuple(leaf.sharding.spec)[:1] == ("pipe",), (name,)
        assert leaf.addressable_shards[0].data.shape[0] * 2 == leaf.shape[0], name

    tp_leaves = [
        (jax.tree_util.keystr(p), l)
        for p, l in flat
        if "model" in tuple(l.sharding.spec)
    ]
    assert tp_leaves, "no model-sharded leaves"
    qkv = [
        (n, l) for n, l in tp_leaves if n.endswith("['qkv']['kernel']")
    ]
    assert qkv, "audio attention weights not model-sharded"
    for name, leaf in qkv:
        local = leaf.addressable_shards[0].data
        assert local.size * 2 == leaf.size, (name, local.shape, leaf.shape)

    zfrac = 0
    for xl in jax.tree_util.tree_leaves(st3.opt_state):
        if isinstance(xl, jax.Array) and xl.ndim >= 1 and xl.size >= (1 << 10):
            spec = tuple(getattr(xl.sharding, "spec", ()) or ())
            if "data" in spec or any(
                isinstance(s, tuple) and "data" in s for s in spec
            ):
                zfrac += 1
    assert zfrac > 0, "no optimizer moment data-sharded under ZeRO"

    # updated trainable params must match the plain step's (modulo trunk
    # layout — trainables are the audio tower, unstacked in both)
    got = jax.device_get(st3.params)
    want = jax.device_get(s1.params)
    flat_g = {
        "/".join(map(str, p)): v
        for p, v in jax.tree_util.tree_leaves_with_path(got)
    }
    flat_w = {
        "/".join(map(str, p)): v
        for p, v in jax.tree_util.tree_leaves_with_path(want)
    }
    assert set(flat_g) == set(flat_w)
    worst = max(
        float(np.max(np.abs(np.asarray(flat_g[k]) - np.asarray(flat_w[k]))))
        for k in flat_w
    )
    assert worst < 2e-4, worst
