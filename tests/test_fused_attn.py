"""Parity of the fused qkv+attention+projection kernel (ops/fused_attn.py)
against the plain XLA composition — values and all gradients, with and
without an additive (causal) bias. Runs in Pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.ops.fused_attn import fused_attention_block, fused_block_applicable

B, T, C, H = 3, 40, 64, 4


def reference(x, wqkv, bqkv, wout, bout, bias=None, heads=H):
    d = x.shape[-1]
    hd = d // heads
    # params use the TP-shardable [C, 3, C] / [3, C] layout; the packed 2D
    # view is a plain reshape (nn.layers._QKVParams)
    wqkv = jnp.reshape(wqkv, (wqkv.shape[0], -1))
    bqkv = jnp.reshape(bqkv, (-1,))
    qkv = x.astype(jnp.float32) @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hs = lambda z: z.reshape(z.shape[0], z.shape[1], heads, hd).transpose(0, 2, 1, 3)
    q, k, v = hs(q), hs(k), hs(v)
    s = jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(hd)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], d)
    return o @ wout + bout


def make(seed=0, b=B):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((b, T, C)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(
        r.standard_normal((C, 3 * C)) * C ** -0.5, jnp.float32
    ).reshape(C, 3, C)
    bqkv = jnp.asarray(r.standard_normal(3 * C) * 0.02, jnp.float32).reshape(3, C)
    wout = jnp.asarray(r.standard_normal((C, C)) * C ** -0.5, jnp.float32)
    bout = jnp.asarray(r.standard_normal(C) * 0.02, jnp.float32)
    return x, wqkv, bqkv, wout, bout


@pytest.mark.parametrize("use_bias", [False, True])
def test_fused_block_forward_and_grads(use_bias):
    x, wqkv, bqkv, wout, bout = make()
    bias = (
        jnp.triu(jnp.full((T, T), -1e30, jnp.float32), k=1) if use_bias else None
    )
    assert fused_block_applicable(T, C, H, have_bool_mask=False)

    out = fused_attention_block(x, wqkv, bqkv, wout, bout, bias=bias, heads=H)
    want = reference(x, wqkv, bqkv, wout, bout, bias=bias)
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)

    def loss_fused(*args):
        return jnp.sum(fused_attention_block(*args, bias=bias, heads=H) ** 2)

    def loss_ref(*args):
        return jnp.sum(reference(*args, bias=bias) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wout, bout)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wout, bout)
    for gf, gr, name in zip(g_fused, g_ref, ["x", "wqkv", "bqkv", "wout", "bout"]):
        np.testing.assert_allclose(
            gf, gr, rtol=5e-3, atol=5e-3 * float(jnp.max(jnp.abs(gr))) + 1e-6,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_block_sharded_matches_single():
    """Under a data-sharded mesh the op shard_maps the batch and psums the
    weight grads — results must equal the unsharded run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x, wqkv, bqkv, wout, bout = make(1, b=4)

    def loss(*args):
        return jnp.sum(fused_attention_block(*args, heads=H) ** 2)

    g_single = jax.grad(loss, argnums=(1, 2))(x, wqkv, bqkv, wout, bout)

    devs = np.array(jax.devices()[:2]).reshape(2, 1)
    mesh = Mesh(devs, ("data", "model"))
    with jax.sharding.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        g_sharded = jax.jit(jax.grad(loss, argnums=(1, 2)))(xs, wqkv, bqkv, wout, bout)
    for gs, g1 in zip(g_sharded, g_single):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(g1), rtol=5e-3, atol=1e-4)


@pytest.mark.parametrize("use_bias", [False, True])
def test_fused_ln_block_forward_and_grads(use_bias):
    """Full sub-block x + proj(attn(LN(x))): values and grads incl. LN."""
    from vipant_tpu.ops.fused_attn import fused_ln_attention_block

    x, wqkv, bqkv, wout, bout = make(2)
    r = np.random.default_rng(7)
    lns = jnp.asarray(1.0 + 0.1 * r.standard_normal(C), jnp.float32)
    lnb = jnp.asarray(0.05 * r.standard_normal(C), jnp.float32)
    bias = (
        jnp.triu(jnp.full((T, T), -1e30, jnp.float32), k=1) if use_bias else None
    )

    def ln(z):
        mu = jnp.mean(z, -1, keepdims=True)
        var = jnp.var(z, -1, keepdims=True)
        return (z - mu) * jax.lax.rsqrt(var + 1e-5) * lns_ + lnb_

    def ref(x, wqkv, bqkv, wout, bout, lns_in, lnb_in):
        global lns_, lnb_
        lns_, lnb_ = lns_in, lnb_in
        return x + reference(ln(x), wqkv, bqkv, wout, bout, bias=bias)

    out = fused_ln_attention_block(
        x, lns, lnb, wqkv, bqkv, wout, bout, bias=bias, heads=H
    )
    want = ref(x, wqkv, bqkv, wout, bout, lns, lnb)
    np.testing.assert_allclose(out, want, rtol=3e-4, atol=3e-4)

    def loss_fused(*a):
        return jnp.sum(
            fused_ln_attention_block(a[0], a[5], a[6], *a[1:5], bias=bias, heads=H) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(ref(*a) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(x, wqkv, bqkv, wout, bout, lns, lnb)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(x, wqkv, bqkv, wout, bout, lns, lnb)
    for a, b, name in zip(gf, gr, ["x", "wqkv", "bqkv", "wout", "bout", "lns", "lnb"]):
        np.testing.assert_allclose(
            a, b, rtol=5e-3, atol=5e-3 * float(jnp.max(jnp.abs(b))) + 1e-6,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_fused_ln_mlp_forward_and_grads(act):
    from vipant_tpu.ops.fused_mlp import fused_ln_mlp_block

    r = np.random.default_rng(5)
    x = jnp.asarray(r.standard_normal((B, T, C)) * 0.5, jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * r.standard_normal(C), jnp.float32)
    lnb = jnp.asarray(0.05 * r.standard_normal(C), jnp.float32)
    wfc = jnp.asarray(r.standard_normal((C, 4 * C)) * C ** -0.5, jnp.float32)
    bfc = jnp.asarray(r.standard_normal(4 * C) * 0.02, jnp.float32)
    wproj = jnp.asarray(r.standard_normal((4 * C, C)) * (4 * C) ** -0.5, jnp.float32)
    bproj = jnp.asarray(r.standard_normal(C) * 0.02, jnp.float32)

    def ref(x, lns, lnb, wfc, bfc, wproj, bproj):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        h = (x - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb
        a = h @ wfc + bfc
        g = a * jax.nn.sigmoid(1.702 * a) if act == "quick_gelu" else jax.nn.gelu(a, approximate=False)
        return x + (g @ wproj + bproj)

    args = (x, lns, lnb, wfc, bfc, wproj, bproj)
    out = fused_ln_mlp_block(*args, act=act)
    want = ref(*args)
    np.testing.assert_allclose(out, want, rtol=3e-4, atol=3e-4)

    gf = jax.grad(lambda *a: jnp.sum(fused_ln_mlp_block(*a, act=act) ** 2), argnums=tuple(range(7)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=tuple(range(7)))(*args)
    for a_, b_, name in zip(gf, gr, ["x", "lns", "lnb", "wfc", "bfc", "wproj", "bproj"]):
        np.testing.assert_allclose(
            a_, b_, rtol=5e-3, atol=5e-3 * float(jnp.max(jnp.abs(b_))) + 1e-6,
            err_msg=f"grad mismatch for {name}",
        )


def test_block_module_matches_manual_composition():
    """ResidualAttentionBlock (holder-based ln_1 path) must equal the
    explicit LayerNorm->MHA->residual composition numerically."""
    from vipant_tpu.nn.layers import (
        LayerNorm, MLP, MultiHeadAttention, ResidualAttentionBlock,
    )
    import flax.linen as nn

    class Manual(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = x + MultiHeadAttention(4, name="attn")(LayerNorm(name="ln_1")(x))
            return h + MLP(name="mlp")(LayerNorm(name="ln_2")(h))

    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 10, 64)), jnp.float32)
    blk = ResidualAttentionBlock(num_heads=4)
    vb = blk.init(jax.random.PRNGKey(0), x)
    man = Manual()
    # identical param trees -> reuse the block's params directly
    got = blk.apply(vb, x)
    want = man.apply(vb, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mha_module_tree_unchanged():
    """The restructured MultiHeadAttention must keep DenseGeneral-compatible
    param paths (attn/qkv/kernel, attn/out/bias, ...) for the porters."""
    from vipant_tpu.nn.layers import MultiHeadAttention

    m = MultiHeadAttention(num_heads=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 64)))
    p = v["params"]
    # qkv stores the TP-shardable [C, 3, C]/[3, C] layout (head blocks
    # contiguous on the last dim); flattening recovers the packed 2D layout
    assert p["qkv"]["kernel"].shape == (64, 3, 64)
    assert p["qkv"]["bias"].shape == (3, 64)
    assert p["out"]["kernel"].shape == (64, 64)
    assert p["out"]["bias"].shape == (64,)


def test_saved_qkv_grads_match_recompute():
    """The saved-qkv backward (fwd stashes the packed projections; bwd skips
    the recompute dot) must produce identical gradients to the flash-style
    recompute path. T >= 128 so the save path actually engages."""
    import os

    from vipant_tpu.ops import fused_attn as fa

    r = np.random.default_rng(7)
    Tl, Cl, Hl = 160, 64, 8
    x = jnp.asarray(r.standard_normal((2, Tl, Cl)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(r.standard_normal((Cl, 3 * Cl)) * Cl ** -0.5).reshape(Cl, 3, Cl)
    bqkv = jnp.asarray(r.standard_normal(3 * Cl) * 0.02).reshape(3, Cl)
    wout = jnp.asarray(r.standard_normal((Cl, Cl)) * Cl ** -0.5)
    bout = jnp.asarray(r.standard_normal(Cl) * 0.02)
    lns, lnb = jnp.ones((Cl,)), jnp.zeros((Cl,))

    def run(flag):
        old = os.environ.get("VIPANT_SAVE_QKV")
        os.environ["VIPANT_SAVE_QKV"] = flag
        try:
            def loss(*a):
                return jnp.sum(
                    fa.fused_ln_attention_block(*a, heads=Hl) ** 2
                )
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
                x, lns, lnb, wqkv, bqkv, wout, bout
            )
        finally:
            if old is None:
                del os.environ["VIPANT_SAVE_QKV"]
            else:
                os.environ["VIPANT_SAVE_QKV"] = old

    assert fa._want_save_qkv(2, Tl, Cl)
    assert not fa._want_save_qkv(100000, Tl, Cl)  # over the HBM budget cap
    g_save, g_rec = run("1"), run("0")
    for a, b in zip(g_save, g_rec):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "Ts,Cs,Hs",
    [(24, 64, 8), (130, 64, 4), (306, 128, 8), (96, 256, 4)],
)
def test_fused_block_shape_sweep(Ts, Cs, Hs):
    """Value parity across the (T, C, heads) envelope the towers use:
    short/long sequences, 8-multiple head dims, T crossing the save-qkv
    threshold (128) and the lane-tile boundary."""
    from vipant_tpu.ops.fused_attn import fused_ln_attention_block

    r = np.random.default_rng(Ts + Cs + Hs)
    x = jnp.asarray(r.standard_normal((2, Ts, Cs)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(r.standard_normal((Cs, 3 * Cs)) * Cs ** -0.5).reshape(Cs, 3, Cs)
    bqkv = jnp.asarray(r.standard_normal(3 * Cs) * 0.02).reshape(3, Cs)
    wout = jnp.asarray(r.standard_normal((Cs, Cs)) * Cs ** -0.5)
    bout = jnp.asarray(r.standard_normal(Cs) * 0.02)
    lns = jnp.asarray(1.0 + 0.1 * r.standard_normal(Cs))
    lnb = jnp.asarray(0.1 * r.standard_normal(Cs))

    got = fused_ln_attention_block(x, lns, lnb, wqkv, bqkv, wout, bout, heads=Hs)

    def ln(z):
        z32 = z.astype(jnp.float32)
        mu = z32.mean(-1, keepdims=True)
        v = z32.var(-1, keepdims=True)
        return (z32 - mu) * jax.lax.rsqrt(v + 1e-5) * lns + lnb

    want = x + reference(ln(x), wqkv, bqkv, wout, bout, heads=Hs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)

    # gradient parity on the largest case only (interpret mode is slow)
    if Ts == 306:
        g1 = jax.grad(
            lambda *a: jnp.sum(fused_ln_attention_block(*a, heads=Hs) ** 2),
            argnums=(0, 3),
        )(x, lns, lnb, wqkv, bqkv, wout, bout)
        g2 = jax.grad(
            lambda xx, wq: jnp.sum((xx + reference(ln(xx), wq, bqkv, wout, bout, heads=Hs)) ** 2),
            argnums=(0, 1),
        )(x, wqkv)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def _tp_mesh():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    return Mesh(devs, ("data", "model"))


def test_fused_block_tensor_parallel_matches_single():
    """Under a data x model mesh the fused op head-parallelizes over the
    model axis (each shard computes H/M heads with its own weight slices,
    partial out-projections psum'd) — values and all grads must equal the
    single-device run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    x, wqkv, bqkv, wout, bout = make(2, b=4)

    def loss(*args):
        return jnp.sum(fused_attention_block(*args, heads=H) ** 2)

    want = fused_attention_block(x, wqkv, bqkv, wout, bout, heads=H)
    g_single = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wout, bout)

    mesh = _tp_mesh()
    with jax.sharding.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(
            lambda *a: fused_attention_block(*a, heads=H)
        )(xs, wqkv, bqkv, wout, bout)
        g_tp = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
            xs, wqkv, bqkv, wout, bout
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4)
    for gt, g1, name in zip(g_tp, g_single, ["x", "wqkv", "bqkv", "wout", "bout"]):
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(g1), rtol=5e-3,
            atol=5e-3 * float(jnp.max(jnp.abs(g1))) + 1e-6,
            err_msg=f"TP grad mismatch for {name}",
        )


def test_fused_ln_block_tensor_parallel_matches_single():
    """The LN variant under TP: LN runs outside the kernel (the partial dh
    must psum before the LayerNorm backward) — full sub-block parity."""
    from vipant_tpu.ops.fused_attn import fused_ln_attention_block
    from jax.sharding import NamedSharding, PartitionSpec as P

    x, wqkv, bqkv, wout, bout = make(3, b=4)
    r = np.random.default_rng(7)
    lns = jnp.asarray(1.0 + 0.1 * r.standard_normal(C), jnp.float32)
    lnb = jnp.asarray(0.05 * r.standard_normal(C), jnp.float32)

    def loss(*args):
        return jnp.sum(fused_ln_attention_block(args[0], args[5], args[6], *args[1:5], heads=H) ** 2)

    args = (x, wqkv, bqkv, wout, bout, lns, lnb)
    want = fused_ln_attention_block(x, lns, lnb, wqkv, bqkv, wout, bout, heads=H)
    g_single = jax.grad(loss, argnums=tuple(range(7)))(*args)

    mesh = _tp_mesh()
    with jax.sharding.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(
            lambda *a: fused_ln_attention_block(a[0], a[5], a[6], *a[1:5], heads=H)
        )(xs, *args[1:])
        g_tp = jax.jit(jax.grad(loss, argnums=tuple(range(7))))(xs, *args[1:])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4)
    names = ["x", "wqkv", "bqkv", "wout", "bout", "lns", "lnb"]
    for gt, g1, name in zip(g_tp, g_single, names):
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(g1), rtol=5e-3,
            atol=5e-3 * float(jnp.max(jnp.abs(g1))) + 1e-6,
            err_msg=f"TP grad mismatch for {name}",
        )


def test_fused_block_tp_saved_qkv(monkeypatch):
    """TP + saved-qkv: the per-shard qkv stash (sharded over data AND model)
    must round-trip into the backward exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    monkeypatch.setenv("VIPANT_SAVE_QKV", "1")
    monkeypatch.setenv("VIPANT_SAVE_QKV_MAX_MB", "1024")
    r = np.random.default_rng(11)
    Tq = 128  # save path needs T >= 128
    x = jnp.asarray(r.standard_normal((4, Tq, C)) * 0.5, jnp.float32)
    _, wqkv, bqkv, wout, bout = make(4)

    def loss(*args):
        return jnp.sum(fused_attention_block(*args, heads=H) ** 2)

    g_single = jax.grad(loss, argnums=(1, 3))(x, wqkv, bqkv, wout, bout)
    mesh = _tp_mesh()
    with jax.sharding.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        g_tp = jax.jit(jax.grad(loss, argnums=(1, 3)))(xs, wqkv, bqkv, wout, bout)
    for gt, g1, name in zip(g_tp, g_single, ["wqkv", "wout"]):
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(g1), rtol=5e-3,
            atol=5e-3 * float(jnp.max(jnp.abs(g1))) + 1e-6,
            err_msg=f"TP saved-qkv grad mismatch for {name}",
        )


def test_fused_block_tensor_parallel_with_pack_bias():
    """Token-packing's block-diagonal bias under the TP head-parallel path:
    values and grads equal the single-device biased run (the bias is
    replicated into every head shard)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    x, wqkv, bqkv, wout, bout = make(11, b=4)
    half = T // 2
    bias = np.zeros((T, T), np.float32)
    bias[:half, half:] = -1e30
    bias[half:, :half] = -1e30
    bias = jnp.asarray(bias)

    def loss(*args):
        return jnp.sum(fused_attention_block(*args, bias=bias, heads=H) ** 2)

    want = fused_attention_block(x, wqkv, bqkv, wout, bout, bias=bias, heads=H)
    g_single = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wout, bout)

    mesh = _tp_mesh()
    with jax.sharding.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(
            lambda *a: fused_attention_block(*a, bias=bias, heads=H)
        )(xs, wqkv, bqkv, wout, bout)
        g_tp = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
            xs, wqkv, bqkv, wout, bout
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4)
    for gt, g1, name in zip(g_tp, g_single, ["x", "wqkv", "bqkv", "wout", "bout"]):
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(g1), rtol=5e-3,
            atol=5e-3 * float(jnp.max(jnp.abs(g1))) + 1e-6,
            err_msg=f"TP+bias grad mismatch for {name}",
        )


def test_fused_block_int8_tensor_parallel_matches_unsharded():
    """Int8 TP path (new in r4 — previously a silent bf16 fallback): each
    shard quantizes and runs its own head-block slices; the psum'd result
    must match the unsharded int8 call to quantization tolerance. (Weight
    scales are per-output-column and thus shard-local == global, but the
    out-projection's per-token ACTIVATION scale is computed over the local
    heads only, so the rounding grids differ slightly — compare by per-token
    cosine like the other int8 parity tests.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vipant_tpu.ops.fused_attn import fused_ln_attention_block_int8

    r = np.random.default_rng(13)
    x = jnp.asarray(r.standard_normal((4, T, C)) * 0.5, jnp.float32)
    _, wqkv, bqkv, wout, bout = make(5)
    lns = jnp.asarray(1.0 + 0.1 * r.standard_normal(C), jnp.float32)
    lnb = jnp.asarray(0.05 * r.standard_normal(C), jnp.float32)

    want = fused_ln_attention_block_int8(x, lns, lnb, wqkv, bqkv, wout, bout, heads=H)
    mesh = _tp_mesh()
    with jax.sharding.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        got = jax.jit(
            lambda *a: fused_ln_attention_block_int8(a[0], lns, lnb, *a[1:], heads=H)
        )(xs, wqkv, bqkv, wout, bout)
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()


def test_param_shardings_attention_head_blocks():
    """param_shardings(attn_heads=...) must shard qkv [C,3,C] on the last
    dim, qkv bias [3,C] on the last dim, and attn out [C,C] on rows — and
    must keep them replicated when head divisibility fails or no head info
    is given."""
    from jax.sharding import Mesh, PartitionSpec as P

    from vipant_tpu.parallel import param_shardings

    devs = np.array(jax.devices()[:4]).reshape(2, 2, 1, 1)
    mesh = Mesh(devs, ("data", "model", "pipe", "seq"))
    params = {
        "audio": {
            "blocks": {
                "block_0": {
                    "attn": {
                        "qkv": {
                            "kernel": jnp.zeros((256, 3, 256)),
                            "bias": jnp.zeros((3, 256)),
                        },
                        "out": {
                            "kernel": jnp.zeros((256, 256)),
                            "bias": jnp.zeros((256,)),
                        },
                    },
                    "mlp": {
                        "fc": {"kernel": jnp.zeros((256, 1024)), "bias": jnp.zeros((1024,))},
                        "proj": {"kernel": jnp.zeros((1024, 256)), "bias": jnp.zeros((256,))},
                    },
                }
            }
        }
    }
    s = param_shardings(params, mesh, min_size=1 << 10, attn_heads={"audio": 4})
    blk = s["audio"]["blocks"]["block_0"]
    assert tuple(blk["attn"]["qkv"]["kernel"].spec) == (None, None, "model")
    assert tuple(blk["attn"]["qkv"]["bias"].spec) == (None, "model")
    assert tuple(blk["attn"]["out"]["kernel"].spec) == ("model", None)
    assert tuple(blk["attn"]["out"]["bias"].spec) == ()
    assert tuple(blk["mlp"]["fc"]["kernel"].spec) == (None, "model")

    # heads not divisible by the model axis -> replicate
    s2 = param_shardings(params, mesh, min_size=1 << 10, attn_heads={"audio": 3})
    assert tuple(s2["audio"]["blocks"]["block_0"]["attn"]["qkv"]["kernel"].spec) == ()
    # no head info -> replicate (kernel still head-parallelizes compute)
    s3 = param_shardings(params, mesh, min_size=1 << 10)
    assert tuple(s3["audio"]["blocks"]["block_0"]["attn"]["qkv"]["kernel"].spec) == ()
