"""Sequence parallelism (ring attention over the `seq` mesh axis) on the
virtual 8-device CPU mesh: ring-attention exactness (values + gradients),
seq-sharded stacked-trunk equivalence, and a full CVAP train step on a
data×seq mesh. The reference has no sequence sharding at all — its long
audio support is parametric only (`/root/reference/cvap/module/encoder/
audio_head.py:89-134`); SURVEY.md §5 reserves token sharding for the
rebuild."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from vipant_tpu.config import compose
from vipant_tpu.models import build_main_model, init_model, tunable_mask
from vipant_tpu.optim import build_optimizer
from vipant_tpu.parallel import (
    adapt_trunk_layout,
    make_mesh,
    ring_attention,
    shard_batch,
    shard_params,
    unstack_in_tree,
)
from vipant_tpu.parallel.spmd import smap
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


def test_ring_attention_matches_full():
    """Ring attention over a seq=4 ring == unsharded attention, values and
    input gradients, composed with a sharded data axis."""
    mesh = make_mesh(data=2, model=1, pipe=1, seq=4)
    B, T, H, D = 4, 16, 2, 8
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
        for _ in range(3)
    )

    ring = smap(
        lambda a, b, c: ring_attention(a, b, c, "seq"),
        mesh,
        in_specs=(P("data", "seq"),) * 3,
        out_specs=P("data", "seq"),
    )
    y_ref = jax.nn.dot_product_attention(q, k, v)
    y_ring = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_ring), atol=1e-6)

    w = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    loss_ref = lambda a, b, c: jnp.sum(jax.nn.dot_product_attention(a, b, c) * w)
    loss_ring = lambda a, b, c: jnp.sum(ring(a, b, c) * w)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_stacked_trunk_seq_parallel_matches_sequential():
    """A StackedTransformer under an ambient seq=4 mesh == the same trunk
    with no mesh: outputs and parameter gradients (pins the psum transpose
    of the replicated params across the seq axis)."""
    from vipant_tpu.nn.layers import StackedTransformer

    model = StackedTransformer(layers=2, num_heads=4)
    B, T, C = 4, 16, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    y_ref = model.apply({"params": params}, x)
    g_ref = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, x) ** 2)
    )(params)

    mesh = make_mesh(data=2, model=1, pipe=1, seq=4)
    calls = []
    import vipant_tpu.parallel.sequence as seqmod

    orig = seqmod.ring_attention
    seqmod.ring_attention = lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    try:
        with jax.sharding.set_mesh(mesh):
            y_sp = jax.jit(lambda p, h: model.apply({"params": p}, h))(params, x)
            g_sp = jax.jit(
                jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x) ** 2))
            )(params)
    finally:
        seqmod.ring_attention = orig
    assert calls, "seq-parallel trunk never routed through ring attention"

    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sp), atol=2e-5)
    flat_r = {
        "/".join(map(str, p)): v
        for p, v in jax.tree_util.tree_leaves_with_path(g_ref)
    }
    flat_s = {
        "/".join(map(str, p)): v
        for p, v in jax.tree_util.tree_leaves_with_path(g_sp)
    }
    assert set(flat_r) == set(flat_s)
    for k in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_r[k]), np.asarray(flat_s[k]), atol=3e-4, err_msg=k
        )


def test_ring_attention_causal_bias_matches_full():
    """Masked ring attention (r4): the additive mask's query rows shard over
    the ring and each step slices the resident rows' key-block columns — the
    result equals dense masked attention, values AND gradients. Pins the
    (i - step) mod S source-shard arithmetic (a wrong offset here would
    still produce plausible outputs)."""
    from vipant_tpu.nn.layers import causal_mask

    mesh = make_mesh(data=2, model=1, pipe=1, seq=4)
    B, T, H, D = 4, 32, 2, 8
    rng = np.random.default_rng(4)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
        for _ in range(3)
    )
    bias = causal_mask(T)  # [T, T] additive

    ring = smap(
        lambda a, b, c, m: ring_attention(a, b, c, "seq", bias=m),
        mesh,
        in_specs=(P("data", "seq"),) * 3 + (P("seq", None),),
        out_specs=P("data", "seq"),
    )
    y_ref = jax.nn.dot_product_attention(q, k, v, bias=bias[None, None])
    y_ring = jax.jit(ring)(q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_ring), atol=2e-6
    )

    w = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    loss_ref = lambda a, b, c: jnp.sum(
        jax.nn.dot_product_attention(a, b, c, bias=bias[None, None]) * w
    )
    loss_ring = lambda a, b, c: jnp.sum(ring(a, b, c, bias) * w)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow  # compile-heavy; covered by faster siblings in the fast tier
def test_masked_trunk_rings_and_matches():
    """A causal-masked trunk now TAKES the ring path (r4 masked ring
    attention — previously it silently replicated compute S-fold) and still
    matches the no-mesh trunk, outputs and parameter gradients."""
    from vipant_tpu.nn.layers import StackedTransformer, causal_mask

    model = StackedTransformer(layers=2, num_heads=4)
    B, T, C = 2, 16, 32
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    mask = causal_mask(T)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y_ref = model.apply({"params": params}, x, mask=mask)
    g_ref = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, x, mask=mask) ** 2)
    )(params)
    mesh = make_mesh(data=2, model=1, pipe=1, seq=4)
    calls = []
    import vipant_tpu.parallel.sequence as seqmod

    orig = seqmod.ring_attention
    seqmod.ring_attention = lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    try:
        with jax.sharding.set_mesh(mesh):
            y_sp = jax.jit(lambda p, h: model.apply({"params": p}, h, mask=mask))(
                params, x
            )
            g_sp = jax.jit(
                jax.grad(
                    lambda p: jnp.sum(model.apply({"params": p}, x, mask=mask) ** 2)
                )
            )(params)
    finally:
        seqmod.ring_attention = orig
    assert calls, "masked seq-parallel trunk never routed through ring attention"
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sp), atol=2e-5)
    flat_r = {
        "/".join(map(str, p)): v
        for p, v in jax.tree_util.tree_leaves_with_path(g_ref)
    }
    flat_s = {
        "/".join(map(str, p)): v
        for p, v in jax.tree_util.tree_leaves_with_path(g_sp)
    }
    assert set(flat_r) == set(flat_s)
    for name in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_r[name]), np.asarray(flat_s[name]),
            atol=3e-4, err_msg=name,
        )


def test_boolean_masked_trunk_falls_back_sequential():
    """Boolean masks have no ring row-sharding (they'd need the same
    additive conversion the dense path does) — the trunk must fall back to
    the sequential unroll and still match no-mesh."""
    from vipant_tpu.nn.layers import StackedTransformer

    model = StackedTransformer(layers=2, num_heads=4)
    B, T, C = 2, 16, 32
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    mask = jnp.tril(jnp.ones((T, T), jnp.bool_))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y_ref = model.apply({"params": params}, x, mask=mask)
    mesh = make_mesh(data=2, model=1, pipe=1, seq=4)
    with jax.sharding.set_mesh(mesh):
        y_sp = jax.jit(lambda p, h: model.apply({"params": p}, h, mask=mask))(
            params, x
        )
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sp), atol=2e-5)


@pytest.mark.slow  # compile-heavy; covered by faster siblings in the fast tier
def test_seq_parallel_cvap_step_matches_plain():
    """One CVAP train step with seq-sharded stacked towers on a data=2·seq=2
    mesh == the plain unstacked single-device step: same loss, same updated
    params (modulo trunk layout). seq=2 because both tower token counts
    (image T=50, audio T=26 at this config) must divide the ring size for
    the seq path to engage — asserted via a ring-attention call counter."""
    cfg = compose(SMALL + ["compute_dtype=float32"])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=10, tunable_mask=mask)

    cfg_s = compose(SMALL + [
        "compute_dtype=float32",
        "mesh.seq=2",
        "model.image.stacked=true",
        "model.audio.stacked=true",
    ])
    model_s = build_main_model(cfg_s)
    variables_s = init_model(cfg_s, model_s)
    params_s = adapt_trunk_layout(variables["params"], variables_s["params"])
    mask_s = tunable_mask(cfg_s, params_s)
    tx_s, _ = build_optimizer(cfg_s.optimizer, steps_per_epoch=10, tunable_mask=mask_s)

    rng = np.random.default_rng(0)
    B = 8
    images = rng.standard_normal((B, 3, 224, 224)).astype(np.float32)
    audios = rng.standard_normal((B, 1, 100, 128)).astype(np.float32)

    step = make_train_step(model, tx, donate=False)
    state0 = TrainState.create(variables["params"], tx)
    state1, m1 = step(state0, jnp.asarray(images), jnp.asarray(audios))

    mesh = make_mesh(data=2, model=1, pipe=1, seq=2)
    step_s = make_train_step(model_s, tx_s, donate=False)
    calls = []
    import vipant_tpu.parallel.sequence as seqmod

    orig = seqmod.ring_attention
    seqmod.ring_attention = lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    try:
        with jax.sharding.set_mesh(mesh):
            placed = shard_params(params_s, mesh)
            state0s = TrainState.create(placed, tx_s)
            bi, ba = shard_batch((images, audios), mesh)
            state2, m2 = step_s(state0s, bi, ba)
    finally:
        seqmod.ring_attention = orig
    assert calls, "seq-parallel step never routed through ring attention"

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-4)
    got = unstack_in_tree(jax.device_get(state2.params))
    want = jax.device_get(state1.params)
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


def test_grad_cache_composes_with_seq_parallel():
    """The gradient cache's lax.map/scan passes wrap the ring-attention
    shard_map cleanly: seq-sharded GC loss == plain GC loss (the north-star
    '+AT w/ GC' feature must survive token sharding)."""
    from vipant_tpu.optim.partition import partition_params
    from vipant_tpu.train.step import make_grad_cache_step

    cfg = compose(SMALL + ["compute_dtype=float32"])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    params_host = jax.device_get(variables["params"])
    mask = tunable_mask(cfg, variables["params"])
    tr, fz = partition_params(variables["params"], mask)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=10)
    rng = np.random.default_rng(0)
    B = 8
    images = rng.standard_normal((B, 3, 224, 224)).astype(np.float32)
    audios = rng.standard_normal((B, 1, 100, 128)).astype(np.float32)
    gc = make_grad_cache_step(
        model, tx, n_chunks=2, method_a="encode_image", method_b="encode_audio"
    )
    s0 = TrainState.create(tr, tx, frozen_params=fz)
    _, m1 = gc(s0, jnp.asarray(images), jnp.asarray(audios))

    cfg_s = compose(SMALL + [
        "compute_dtype=float32", "mesh.seq=2",
        "model.image.stacked=true", "model.audio.stacked=true",
    ])
    model_s = build_main_model(cfg_s)
    vars_s = init_model(cfg_s, model_s)
    ps = adapt_trunk_layout(params_host, vars_s["params"])
    mask_s = tunable_mask(cfg_s, ps)
    trs_, fzs_ = partition_params(ps, mask_s)
    gcs = make_grad_cache_step(
        model_s, tx, n_chunks=2, method_a="encode_image", method_b="encode_audio"
    )
    mesh = make_mesh(data=2, model=1, pipe=1, seq=2)
    calls = []
    import vipant_tpu.parallel.sequence as seqmod

    orig = seqmod.ring_attention
    seqmod.ring_attention = lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    try:
        with jax.sharding.set_mesh(mesh):
            trs = shard_params(trs_, mesh)
            fzs = shard_params(fzs_, mesh)
            sp0 = TrainState.create(trs, tx, frozen_params=fzs)
            bi, ba = shard_batch((images, audios), mesh)
            _, m2 = gcs(sp0, bi, ba)
    finally:
        seqmod.ring_attention = orig
    assert calls, "seq-sharded GC never routed through ring attention"
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)


def test_ring_attention_bf16():
    """bf16 inputs keep fp32 online-softmax statistics: ring == full
    attention at bf16 tolerance (the flagship compute dtype)."""
    mesh = make_mesh(data=1, model=1, pipe=1, seq=8)
    B, T, H, D = 2, 64, 4, 16
    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
        for _ in range(3)
    )
    ring = smap(
        lambda a, b, c: ring_attention(a, b, c, "seq"),
        mesh,
        in_specs=(P(None, "seq"),) * 3,
        out_specs=P(None, "seq"),
    )
    y_ref = jax.nn.dot_product_attention(q, k, v)
    y_ring = jax.jit(ring)(q, k, v)
    assert y_ring.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_ring, np.float32), atol=2e-2
    )


def test_seq_and_model_axes_refuse_to_combine():
    """The ring's in_specs replicate params, so a model-sharded trunk under
    seq would silently all-gather its Megatron slices — asserted instead."""
    from vipant_tpu.nn.layers import StackedTransformer

    model = StackedTransformer(layers=2, num_heads=4)
    B, T, C = 2, 16, 32
    x = jnp.zeros((B, T, C), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mesh = make_mesh(data=2, model=2, pipe=1, seq=2)
    with jax.sharding.set_mesh(mesh):
        with pytest.raises(AssertionError, match="seq and model"):
            model.apply({"params": params}, x)


def test_ring_attention_fully_masked_rows_stay_finite():
    """A query row whose keys are ALL -inf-masked (the standard additive
    convention, e.g. pad queries) must not poison the online-softmax
    accumulators: without the m_new clamp, step 0 computes
    exp(-inf + inf) = NaN and every later ring step inherits it. Masked
    rows return 0 (the flash-attention convention for empty softmax rows);
    unmasked rows still match dense attention exactly."""
    mesh = make_mesh(data=2, model=1, pipe=1, seq=4)
    B, T, H, D = 2, 16, 2, 8
    rng = np.random.default_rng(11)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
        for _ in range(3)
    )
    bias = np.zeros((T, T), np.float32)
    dead = [0, 5, 13]  # rows on three different ring shards
    bias[dead, :] = -np.inf
    bias = jnp.asarray(bias)

    ring = smap(
        lambda a, b, c, m: ring_attention(a, b, c, "seq", bias=m),
        mesh,
        in_specs=(P("data", "seq"),) * 3 + (P("seq", None),),
        out_specs=P("data", "seq"),
    )
    y = np.asarray(jax.jit(ring)(q, k, v, bias))
    assert np.isfinite(y).all(), "ring attention NaN'd on -inf-masked rows"
    np.testing.assert_array_equal(y[:, dead], np.zeros_like(y[:, dead]))
    alive = [t for t in range(T) if t not in dead]
    y_ref = np.asarray(
        jax.nn.dot_product_attention(q, k, v, bias=bias[None, None])
    )
    np.testing.assert_allclose(y[:, alive], y_ref[:, alive], atol=2e-6)
