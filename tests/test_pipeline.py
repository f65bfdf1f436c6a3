"""Pipeline parallelism (GPipe over the `pipe` mesh axis) on the virtual
8-device CPU mesh: executor exactness, stacked-trunk equivalence, LARS
semantics, sharding specs, and a full pipelined CVAP train step."""

import jax
import os
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.models import build_main_model, init_model, tunable_mask
from vipant_tpu.optim import build_optimizer
from vipant_tpu.optim.lars import lars
from vipant_tpu.parallel import (
    adapt_trunk_layout,
    gpipe,
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
    shard_params,
    stack_block_tree,
    unstack_block_tree,
    unstack_in_tree,
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


def test_gpipe_exact_fwd_and_grad():
    """Pipelined layer application == sequential, values and gradients,
    composed with a sharded data axis (data=2, pipe=2)."""
    mesh = make_mesh(data=2, model=2, pipe=2)
    L, B, T, C = 4, 8, 5, 16
    key = jax.random.PRNGKey(0)
    Ws = jax.random.normal(key, (L, C, C)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))

    def stage(w, h):
        return jnp.tanh(h @ w) + h

    def seq(Ws, x):
        return jax.lax.scan(lambda h, w: (stage(w, h), None), x, Ws)[0]

    def piped(Ws, x):
        return gpipe(stage, Ws, x, mesh=mesh, n_micro=2)

    with jax.sharding.set_mesh(mesh):
        y_seq = jax.jit(seq)(Ws, x)
        y_pipe = jax.jit(piped)(Ws, x)
        np.testing.assert_allclose(
            np.asarray(y_seq), np.asarray(y_pipe), rtol=1e-6, atol=1e-6
        )
        g_seq = jax.jit(jax.grad(lambda W, x: (seq(W, x) ** 2).sum()))(Ws, x)
        g_pipe = jax.jit(jax.grad(lambda W, x: (piped(W, x) ** 2).sum()))(Ws, x)
        np.testing.assert_allclose(
            np.asarray(g_seq), np.asarray(g_pipe), rtol=1e-4, atol=1e-5
        )


def test_layout_converters_roundtrip():
    rng = np.random.default_rng(0)
    tree = {
        f"block_{i}": {
            "attn": {"qkv": {"kernel": rng.standard_normal((4, 12)).astype(np.float32)}},
            "ln_1": {"scale": rng.standard_normal(4).astype(np.float32)},
        }
        for i in range(3)
    }
    stacked = stack_block_tree(tree)
    assert stacked["attn"]["qkv"]["kernel"].shape == (3, 4, 12)
    back = unstack_block_tree(stacked)
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(back[f"block_{i}"]["ln_1"]["scale"]),
            tree[f"block_{i}"]["ln_1"]["scale"],
        )
    # adapt: unrolled -> stacked target and back
    target_stacked = {"encoder": {"transformer": {"blocks": stacked}}}
    src_unrolled = {"encoder": {"transformer": dict(tree)}}
    adapted = adapt_trunk_layout(src_unrolled, target_stacked)
    assert adapted["encoder"]["transformer"]["blocks"]["attn"]["qkv"]["kernel"].shape == (3, 4, 12)
    again = adapt_trunk_layout(adapted, src_unrolled)
    assert "block_2" in again["encoder"]["transformer"]
    # unstack_in_tree finds stacked trunks anywhere
    flat = unstack_in_tree(target_stacked)
    assert "block_1" in flat["encoder"]["transformer"]


def test_stacked_transformer_matches_unrolled():
    """StackedTransformer(converted params) ≡ Transformer, with and
    without a causal mask."""
    from vipant_tpu.nn.layers import StackedTransformer, Transformer, causal_mask

    B, T, C, H, L = 2, 7, 32, 4, 3
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, C)), jnp.float32)
    unrolled = Transformer(layers=L, num_heads=H)
    stacked = StackedTransformer(layers=L, num_heads=H)
    pu = unrolled.init(jax.random.PRNGKey(0), x)["params"]
    ps = {"blocks": stack_block_tree(pu)}
    for mask in (None, causal_mask(T)):
        y_u = unrolled.apply({"params": pu}, x, mask)
        y_s = stacked.apply({"params": ps}, x, mask)
        np.testing.assert_allclose(
            np.asarray(y_u), np.asarray(y_s), rtol=1e-5, atol=1e-5
        )


def test_lars_stacked_equals_unrolled():
    """The LARS update on a pipeline-stacked trunk must equal the update on
    the unrolled layout (per-layer trust ratios, ndim-1 grouping)."""
    rng = np.random.default_rng(0)
    L = 3
    blocks = {
        f"block_{i}": {
            "kernel": rng.standard_normal((8, 8)).astype(np.float32),
            "bias": rng.standard_normal(8).astype(np.float32),
        }
        for i in range(L)
    }
    grads_u = jax.tree_util.tree_map(lambda p: 0.1 * p + 0.01, blocks)
    params_u = {"trunk": blocks}
    grads_uu = {"trunk": grads_u}
    params_s = {"trunk": {"blocks": stack_block_tree(blocks)}}
    grads_s = {"trunk": {"blocks": stack_block_tree(grads_u)}}

    tx = lars(lambda step: 0.1)
    st_u = tx.init(params_u)
    st_s = tx.init(params_s)
    up_u, _ = tx.update(grads_uu, st_u, params_u)
    up_s, _ = tx.update(grads_s, st_s, params_s)
    up_s_unrolled = unstack_block_tree(up_s["trunk"]["blocks"])
    for i in range(L):
        for k in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(up_u["trunk"][f"block_{i}"][k]),
                np.asarray(up_s_unrolled[f"block_{i}"][k]),
                rtol=1e-6,
                atol=1e-7,
            )


def test_param_shardings_pipe_axis():
    mesh = make_mesh(data=2, model=1, pipe=2)
    params = {
        "encoder": {
            "transformer": {
                "blocks": {
                    "mlp": {"fc": {"kernel": jnp.zeros((4, 8, 32))}},
                    "ln_1": {"scale": jnp.zeros((4, 8))},
                }
            }
        },
        "misc": {"pos": jnp.zeros((10, 8))},
    }
    shardings = param_shardings(params, mesh)
    blk = shardings["encoder"]["transformer"]["blocks"]
    assert blk["mlp"]["fc"]["kernel"].spec == jax.sharding.PartitionSpec("pipe")
    assert blk["ln_1"]["scale"].spec == jax.sharding.PartitionSpec("pipe")
    assert shardings["misc"]["pos"].spec == jax.sharding.PartitionSpec()


def test_pipelined_cvap_step_matches_plain():
    """One CVAP train step with pipeline-stacked towers on a data=2·pipe=2
    mesh == the plain unstacked single-device step: same loss, same updated
    params (modulo layout)."""
    cfg = compose(SMALL + ["compute_dtype=float32"])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=10, tunable_mask=mask)

    cfg_p = compose(SMALL + [
        "compute_dtype=float32",
        "mesh.pipe=2",
        "model.image.stacked=true",
        "model.audio.stacked=true",
    ])
    model_p = build_main_model(cfg_p)
    variables_p = init_model(cfg_p, model_p)
    params_p = adapt_trunk_layout(variables["params"], variables_p["params"])
    mask_p = tunable_mask(cfg_p, params_p)
    tx_p, _ = build_optimizer(cfg_p.optimizer, steps_per_epoch=10, tunable_mask=mask_p)

    rng = np.random.default_rng(0)
    B = 8
    images = rng.standard_normal((B, 3, 224, 224)).astype(np.float32)
    audios = rng.standard_normal((B, 1, 100, 128)).astype(np.float32)

    # plain single-device step
    step = make_train_step(model, tx, donate=False)
    state0 = TrainState.create(variables["params"], tx)
    state1, m1 = step(state0, jnp.asarray(images), jnp.asarray(audios))

    # pipelined sharded step
    mesh = make_mesh(data=2, model=1, pipe=2)
    step_p = make_train_step(model_p, tx_p, donate=False)
    with jax.sharding.set_mesh(mesh):
        placed = shard_params(params_p, mesh)
        state0p = TrainState.create(placed, tx_p)
        bi, ba = shard_batch((images, audios), mesh)
        state2, m2 = step_p(state0p, bi, ba)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-4)
    got = unstack_in_tree(jax.device_get(state2.params))
    want = jax.device_get(state1.params)
    flat_g = {"/".join(map(str, p)): v for p, v in jax.tree_util.tree_leaves_with_path(got)}
    flat_w = {"/".join(map(str, p)): v for p, v in jax.tree_util.tree_leaves_with_path(want)}
    assert set(flat_g) == set(flat_w)
    worst = max(
        float(np.max(np.abs(np.asarray(flat_g[k]) - np.asarray(flat_w[k]))))
        for k in flat_w
    )
    assert worst < 2e-4, worst


@pytest.mark.slow  # compile-heavy; covered by faster siblings in the fast tier
def test_stacked_without_pipe_axis_runs_sequentially():
    """A stacked trunk outside any mesh runs the lax.scan path and matches
    the unrolled module (serving a pipeline-trained export on one chip)."""
    cfg_p = compose(SMALL + ["compute_dtype=float32", "model.audio.stacked=true"])
    model_p = build_main_model(cfg_p)
    variables_p = init_model(cfg_p, model_p)
    cfg = compose(SMALL + ["compute_dtype=float32"])
    model = build_main_model(cfg)
    params_u = adapt_trunk_layout(variables_p["params"], init_model(cfg, model)["params"])

    audios = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 1, 100, 128)), jnp.float32
    )
    e_p = model_p.apply({"params": variables_p["params"]}, audios, method=model_p.encode_audio)
    e_u = model.apply({"params": params_u}, audios, method=model.encode_audio)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_u), rtol=2e-5, atol=2e-5)

def test_grad_cache_composes_with_pipeline():
    """The gradient cache's lax.map/scan passes wrap the gpipe shard_map
    cleanly: pipelined GC loss == plain GC loss (the north-star '+AT w/ GC'
    feature must survive depth sharding)."""
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
    gc = make_grad_cache_step(model, tx, n_chunks=2, method_a="encode_image", method_b="encode_audio")
    s0 = TrainState.create(tr, tx, frozen_params=fz)
    _, m1 = gc(s0, jnp.asarray(images), jnp.asarray(audios))

    cfg_p = compose(SMALL + [
        "compute_dtype=float32", "mesh.pipe=2",
        "model.image.stacked=true", "model.audio.stacked=true",
    ])
    model_p = build_main_model(cfg_p)
    vars_p = init_model(cfg_p, model_p)
    pp = adapt_trunk_layout(params_host, vars_p["params"])
    mask_p = tunable_mask(cfg_p, pp)
    trp, fzp = partition_params(pp, mask_p)
    gcp = make_grad_cache_step(model_p, tx, n_chunks=2, method_a="encode_image", method_b="encode_audio")
    mesh = make_mesh(data=2, model=1, pipe=2)
    with jax.sharding.set_mesh(mesh):
        trs = shard_params(trp, mesh)
        fzs = shard_params(fzp, mesh)
        sp0 = TrainState.create(trs, tx, frozen_params=fzs)
        bi, ba = shard_batch((images, audios), mesh)
        _, m2 = gcp(sp0, bi, ba)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)


def test_deit_blocks_name_collision():
    """The DeiT tower nests its UNROLLED trunk under a module named
    'blocks' (nn/deit.py) — the stacked-trunk machinery must not touch it:
    exports stay intact, LARS keeps weight semantics, param_shardings
    leaves it replicated on a pipe mesh."""
    rng = np.random.default_rng(0)
    deit_like = {
        "audio": {
            "blocks": {
                f"block_{i}": {
                    "attn": {"qkv": {"kernel": rng.standard_normal((8, 24)).astype(np.float32),
                                      "bias": rng.standard_normal(24).astype(np.float32)}},
                }
                for i in range(2)
            },
            "patch_embed": {"kernel": rng.standard_normal((4, 8)).astype(np.float32)},
        }
    }
    # 1. export path: unstack_in_tree is the identity on the unrolled trunk
    out = unstack_in_tree(deit_like)
    assert set(out["audio"]["blocks"]) == {"block_0", "block_1"}
    np.testing.assert_array_equal(
        np.asarray(out["audio"]["blocks"]["block_0"]["attn"]["qkv"]["kernel"]),
        deit_like["audio"]["blocks"]["block_0"]["attn"]["qkv"]["kernel"],
    )
    # 2. adapt is a no-op between identical DeiT layouts
    adapted = adapt_trunk_layout(deit_like, deit_like)
    assert set(adapted["audio"]["blocks"]) == {"block_0", "block_1"}
    # 3. LARS treats the 2-D kernels under blocks/block_i as WEIGHTS
    from vipant_tpu.optim.lars import lars as make_lars

    params = deit_like
    grads = jax.tree_util.tree_map(lambda p: 0.1 * p + 0.01, params)
    renamed = {"audio": {"trunk": params["audio"]["blocks"],
               "patch_embed": params["audio"]["patch_embed"]}}
    grads_renamed = {"audio": {"trunk": grads["audio"]["blocks"],
                     "patch_embed": grads["audio"]["patch_embed"]}}
    tx = make_lars(lambda step: 0.1)
    up, _ = tx.update(grads, tx.init(params), params)
    up_ref, _ = tx.update(grads_renamed, tx.init(renamed), renamed)
    np.testing.assert_allclose(
        np.asarray(up["audio"]["blocks"]["block_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(up_ref["audio"]["trunk"]["block_0"]["attn"]["qkv"]["kernel"]),
        rtol=1e-7,
    )
    # 4. pipe mesh: DeiT leaves stay replicated (no P('pipe'))
    mesh = make_mesh(data=2, model=1, pipe=2)
    sh = param_shardings(jax.tree_util.tree_map(jnp.asarray, deit_like), mesh)
    assert sh["audio"]["blocks"]["block_0"]["attn"]["qkv"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_gpipe_four_stages_and_micro_override():
    """4 pipeline stages (1 layer each) and an explicit microbatch count
    still match sequential execution."""
    mesh = make_mesh(data=2, model=1, pipe=4)
    L, B, T, C = 4, 8, 3, 8
    Ws = jax.random.normal(jax.random.PRNGKey(2), (L, C, C)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, C))

    def stage(w, h):
        return jnp.tanh(h @ w) + h

    def seq(Ws, x):
        h = x
        for i in range(L):
            h = stage(Ws[i], h)
        return h

    with jax.sharding.set_mesh(mesh):
        y_seq = jax.jit(seq)(Ws, x)
        for n_micro in (None, 2, 4):
            y = jax.jit(
                lambda W, x, m=n_micro: gpipe(stage, W, x, mesh=mesh, n_micro=m)
            )(Ws, x)
            np.testing.assert_allclose(
                np.asarray(y_seq), np.asarray(y), rtol=1e-6, atol=1e-6,
                err_msg=f"n_micro={n_micro}",
            )


def test_token_pack_composes_with_pipeline():
    """token_pack's block-diagonal mask rides gpipe's consts path: a packed
    + pipeline-stacked image tower matches the plain tower."""
    from vipant_tpu.nn import build_image_head

    cfg = compose(SMALL + ["compute_dtype=float32"])
    tower = build_image_head(cfg.model.image)
    cfg_p = compose(SMALL + ["compute_dtype=float32"])
    cfg_p.model.image["token_pack"] = 4
    cfg_p.model.image["stacked"] = True
    packed = build_image_head(cfg_p.model.image)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 3, 224, 224)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), x)["params"]
    params_p = adapt_trunk_layout(
        params, packed.init(jax.random.PRNGKey(1), x)["params"]
    )
    y0 = tower.apply({"params": params}, x)
    mesh = make_mesh(data=2, model=1, pipe=2)
    with jax.sharding.set_mesh(mesh):
        y1 = jax.jit(lambda p, x: packed.apply({"params": p}, x))(params_p, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-5, atol=2e-5)


def test_pipelined_state_checkpoint_roundtrip(tmp_path):
    """Collective Orbax save/restore of a pipe-sharded stacked TrainState:
    shardings and values survive the round trip."""
    from vipant_tpu.ckpt import load_checkpoint, save_checkpoint
    from vipant_tpu.optim.partition import partition_params

    cfg = compose(SMALL + [
        "compute_dtype=float32", "mesh.pipe=2",
        "model.image.stacked=true", "model.audio.stacked=true",
    ])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    tr, fz = partition_params(variables["params"], mask)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=10)
    mesh = make_mesh(data=2, model=1, pipe=2)
    with jax.sharding.set_mesh(mesh):
        trs = shard_params(tr, mesh)
        fzs = shard_params(fz, mesh)
        state = TrainState.create(trs, tx, frozen_params=fzs)
        path = save_checkpoint(str(tmp_path), 3, state, cfg=cfg)
        restored = load_checkpoint(path, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        assert a.sharding == b.sharding, (a.sharding, b.sharding)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the weight-only export beside the state is canonically UNROLLED;
    # this save has no model_only export, so just re-check the converter
    from vipant_tpu.parallel import unstack_in_tree

    flat = unstack_in_tree(jax.device_get(restored.params))
    keys = {"/".join(map(str, p)) for p, _ in jax.tree_util.tree_leaves_with_path(flat)}
    assert not any("'blocks'" in k and "block_" not in k for k in keys)


def test_pipelined_trainer_train_save_resume(tmp_path):
    """Production path under mesh.pipe=2: _apply_pipeline_cfg auto-stacks
    the transformer towers, the monitor trains, saves a collective
    checkpoint, and a fresh monitor resumes from it with identical params."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from data_synth import make_synth_va_index
    from vipant_tpu.train import build_monitor

    make_synth_va_index(str(tmp_path / "data"), "train", n=8, seconds=1.05)
    make_synth_va_index(str(tmp_path / "data"), "val", n=4, seconds=1.05)
    base = [
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
        f"running.data_root={tmp_path}/data",
        "running.data_name=train",
        "running.eval_name=val",
        "running.batch_size=8",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=True",
        "running.eval_samples=4",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "eval=False",
        "mesh.data=2",
        "mesh.model=1",
        "mesh.pipe=2",
    ]
    mon = build_monitor(compose(base + ["model_file="]))
    # auto-stacking happened and the params really are layer-stacked
    assert bool(mon.cfg.model.audio.get("stacked")) is True
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_leaves_with_path(mon.state.params)
    }
    assert any("/blocks/" in f"/{k}/" for k in flat), sorted(flat)[:5]
    mon.learn()
    ckpts = sorted(d for d in os.listdir(f"{tmp_path}/run/test") if d.isdigit())
    assert ckpts, "no checkpoint saved"

    mon2 = build_monitor(compose(base + [f"model_file={ckpts[-1]}"]))
    for a, b in zip(
        jax.tree_util.tree_leaves(mon.state.params),
        jax.tree_util.tree_leaves(mon2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stacked_remat_matches_unrolled():
    """remat'd stacked trunk: gradients match the plain module, and the
    pipelined remat forward matches sequential."""
    from vipant_tpu.nn.layers import StackedTransformer, Transformer

    B, T, C, H, L = 2, 5, 16, 4, 4
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, C)), jnp.float32)
    u = Transformer(layers=L, num_heads=H)
    pu = u.init(jax.random.PRNGKey(0), x)["params"]
    ps = {"blocks": stack_block_tree(pu)}
    s = StackedTransformer(layers=L, num_heads=H, remat=True)

    gu = jax.grad(lambda p: (u.apply({"params": p}, x) ** 2).sum())(pu)
    gs = unstack_block_tree(
        jax.grad(lambda p: (s.apply({"params": p}, x) ** 2).sum())(ps)["blocks"]
    )
    for i in range(L):
        for a, b in zip(
            jax.tree_util.tree_leaves(gu[f"block_{i}"]),
            jax.tree_util.tree_leaves(gs[f"block_{i}"]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    mesh = make_mesh(data=2, model=1, pipe=2)
    xb = jnp.tile(x, (4, 1, 1))
    with jax.sharding.set_mesh(mesh):
        y_pipe = jax.jit(lambda p, x: s.apply({"params": p}, x))(ps, xb)
    np.testing.assert_allclose(
        np.asarray(u.apply({"params": pu}, xb)), np.asarray(y_pipe), rtol=1e-5, atol=1e-5
    )
