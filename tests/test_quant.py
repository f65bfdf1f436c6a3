"""Int8 serving quantization: helper round-trips, the int8 fused-MLP kernel's
numerics vs the fp32 reference math, and the serving-only contract.

The reference serves fp16 CUDA (`/root/reference/clip/model.py:372-393`);
the int8 MXU path is the TPU-native production analogue (v5e int8 peak is
2× bf16; measured 1.26× on the MLP blocks at B=256 — docs/performance.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vipant_tpu.ops.quant import quantize_cols, quantize_rows


def test_quantize_cols_roundtrip_bound():
    r = np.random.default_rng(0)
    w = r.standard_normal((64, 48)).astype(np.float32) * 0.02
    wi, s = quantize_cols(jnp.asarray(w))
    assert wi.dtype == jnp.int8 and s.shape == (1, 48)
    back = np.asarray(wi, np.float32) * np.asarray(s)
    # symmetric int8: error per element <= scale/2 = absmax/254
    bound = np.abs(w).max(axis=0) / 254.0 + 1e-9
    assert (np.abs(back - w) <= bound[None, :] + 1e-7).all()


def test_quantize_rows_roundtrip_bound():
    r = np.random.default_rng(1)
    x = r.standard_normal((10, 96)).astype(np.float32)
    xi, s = quantize_rows(jnp.asarray(x))
    assert xi.dtype == jnp.int8 and s.shape == (10, 1)
    back = np.asarray(xi, np.float32) * np.asarray(s)
    bound = np.abs(x).max(axis=-1) / 254.0 + 1e-9
    assert (np.abs(back - x) <= bound[:, None] + 1e-7).all()


def _mlp_ref(x, lns, lnb, wfc, bfc, wproj, bproj):
    x32 = x.astype(np.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    h = (x32 - mu) / np.sqrt(var + 1e-5) * lns + lnb
    a = h @ wfc + bfc
    g = a / (1.0 + np.exp(-1.702 * a))  # quick_gelu
    return x32 + g @ wproj + bproj


@pytest.mark.parametrize("act", ["quick_gelu"])
def test_int8_fused_mlp_matches_fp32(act):
    """Interpret-mode kernel vs fp32 NumPy math: per-token cosine ≥ 0.999."""
    from vipant_tpu.ops.fused_mlp import fused_ln_mlp_block_int8

    r = np.random.default_rng(2)
    B, T, C = 2, 24, 64
    x = r.standard_normal((B, T, C)).astype(np.float32)
    lns = (1.0 + 0.1 * r.standard_normal(C)).astype(np.float32)
    lnb = (0.1 * r.standard_normal(C)).astype(np.float32)
    wfc = (r.standard_normal((C, 4 * C)) * 0.05).astype(np.float32)
    bfc = (r.standard_normal(4 * C) * 0.01).astype(np.float32)
    wproj = (r.standard_normal((4 * C, C)) * 0.05).astype(np.float32)
    bproj = (r.standard_normal(C) * 0.01).astype(np.float32)

    out = np.asarray(
        fused_ln_mlp_block_int8(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(lns), jnp.asarray(lnb),
            jnp.asarray(wfc), jnp.asarray(bfc), jnp.asarray(wproj),
            jnp.asarray(bproj), act=act,
        ),
        np.float32,
    )
    ref = _mlp_ref(x, lns, lnb, wfc, bfc, wproj, bproj)
    cos = (out * ref).sum(-1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()


def test_int8_fused_mlp_is_forward_only():
    """No VJP: differentiating through the int8 kernel must fail loudly
    (training misuse), not silently produce wrong gradients."""
    from vipant_tpu.ops.fused_mlp import fused_ln_mlp_block_int8

    r = np.random.default_rng(3)
    C = 32
    x = jnp.asarray(r.standard_normal((1, 8, C)), jnp.float32)
    args = (
        jnp.ones(C), jnp.zeros(C),
        jnp.asarray(r.standard_normal((C, 4 * C)) * 0.05, jnp.float32),
        jnp.zeros(4 * C),
        jnp.asarray(r.standard_normal((4 * C, C)) * 0.05, jnp.float32),
        jnp.zeros(C),
    )
    with pytest.raises(Exception):
        jax.grad(lambda w: fused_ln_mlp_block_int8(x, args[0], args[1], w, *args[3:]).sum())(
            args[2]
        )


def test_engine_quantize_flag_validation():
    """quantize modes are validated before any model build."""
    from vipant_tpu.serve import InferenceEngine

    with pytest.raises(ValueError, match="unknown quantize"):
        InferenceEngine([], quantize="int4")


def _attn_ref(x, lns, lnb, wqkv, bqkv, wout, bout, heads, bias=None):
    """fp32 NumPy pre-LN attention sub-block x + proj(attn(LN(x)))."""
    x32 = x.astype(np.float64)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    h = (x32 - mu) / np.sqrt(var + 1e-5) * lns + lnb
    B, T, C = x.shape
    D = C // heads
    qkv = h @ wqkv + bqkv  # [B, T, 3C]
    q, k, v = np.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    s = q @ k.transpose(0, 1, 3, 2) / np.sqrt(D)
    if bias is not None:
        s = s + bias
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    o = (p @ v).transpose(0, 2, 1, 3).reshape(B, T, C)
    return x32 + o @ wout + bout


def test_int8_fused_attention_matches_fp32():
    """Interpret-mode int8 attention kernel vs fp32 NumPy math: per-token
    cosine ≥ 0.999 (score/context dots stay high precision; only the two
    projections quantize)."""
    from vipant_tpu.ops.fused_attn import fused_ln_attention_block_int8

    import jax.numpy as jnp

    r = np.random.default_rng(4)
    B, T, C, H = 2, 24, 64, 4
    x = r.standard_normal((B, T, C)).astype(np.float32)
    lns = (1.0 + 0.1 * r.standard_normal(C)).astype(np.float32)
    lnb = (0.1 * r.standard_normal(C)).astype(np.float32)
    wqkv = (r.standard_normal((C, 3 * C)) * 0.05).astype(np.float32)
    bqkv = (r.standard_normal(3 * C) * 0.01).astype(np.float32)
    wout = (r.standard_normal((C, C)) * 0.05).astype(np.float32)
    bout = (r.standard_normal(C) * 0.01).astype(np.float32)

    out = np.asarray(
        fused_ln_attention_block_int8(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(lns), jnp.asarray(lnb),
            jnp.asarray(wqkv).reshape(C, 3, C), jnp.asarray(bqkv).reshape(3, C),
            jnp.asarray(wout), jnp.asarray(bout), heads=H,
        ),
        np.float32,
    )
    ref = _attn_ref(x, lns, lnb, wqkv, bqkv, wout, bout, H)
    cos = (out * ref).sum(-1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()


def test_int8_fused_attention_causal_bias():
    """The additive-mask path (causal text tower / token packing) must
    compose with the int8 projections."""
    from vipant_tpu.nn.layers import causal_mask
    from vipant_tpu.ops.fused_attn import fused_ln_attention_block_int8

    import jax.numpy as jnp

    r = np.random.default_rng(5)
    B, T, C, H = 2, 16, 64, 4
    x = r.standard_normal((B, T, C)).astype(np.float32)
    lns = np.ones(C, np.float32)
    lnb = np.zeros(C, np.float32)
    wqkv = (r.standard_normal((C, 3 * C)) * 0.05).astype(np.float32)
    bqkv = np.zeros(3 * C, np.float32)
    wout = (r.standard_normal((C, C)) * 0.05).astype(np.float32)
    bout = np.zeros(C, np.float32)
    m = np.asarray(causal_mask(T), np.float32)

    out = np.asarray(
        fused_ln_attention_block_int8(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(lns), jnp.asarray(lnb),
            jnp.asarray(wqkv).reshape(C, 3, C), jnp.asarray(bqkv).reshape(3, C),
            jnp.asarray(wout), jnp.asarray(bout), bias=jnp.asarray(m), heads=H,
        ),
        np.float32,
    )
    ref = _attn_ref(
        x, lns, lnb, wqkv, bqkv, wout, bout, H,
        bias=np.maximum(m, -1e30)[None, None],
    )
    cos = (out * ref).sum(-1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()


def test_int8_kernels_under_data_mesh():
    """The int8 fwd kernels' shard_map branch (ambient data mesh) must equal
    the unsharded call — the path InferenceEngine(data_parallel=True,
    quantize='int8') takes on a multi-device host."""
    import jax.numpy as jnp

    from vipant_tpu.ops.fused_attn import fused_ln_attention_block_int8
    from vipant_tpu.ops.fused_mlp import fused_ln_mlp_block_int8
    from vipant_tpu.parallel import make_mesh, shard_batch

    r = np.random.default_rng(6)
    B, T, C, H = 8, 16, 64, 4
    x = jnp.asarray(r.standard_normal((B, T, C)), jnp.float32)
    lns = jnp.ones(C)
    lnb = jnp.zeros(C)
    wq = jnp.asarray(r.standard_normal((C, 3 * C)) * 0.05, jnp.float32).reshape(C, 3, C)
    bq = jnp.zeros((3, C))
    wo = jnp.asarray(r.standard_normal((C, C)) * 0.05, jnp.float32)
    bo = jnp.zeros(C)
    wfc = jnp.asarray(r.standard_normal((C, 4 * C)) * 0.05, jnp.float32)
    bfc = jnp.zeros(4 * C)
    wpj = jnp.asarray(r.standard_normal((4 * C, C)) * 0.05, jnp.float32)
    bpj = jnp.zeros(C)

    ref_a = fused_ln_attention_block_int8(x, lns, lnb, wq, bq, wo, bo, heads=H)
    ref_m = fused_ln_mlp_block_int8(x, lns, lnb, wfc, bfc, wpj, bpj)
    mesh = make_mesh(data=4, model=1)
    with jax.sharding.set_mesh(mesh):
        (xs,) = shard_batch((x,), mesh)
        out_a = jax.jit(
            lambda a: fused_ln_attention_block_int8(a, lns, lnb, wq, bq, wo, bo, heads=H)
        )(xs)
        out_m = jax.jit(
            lambda a: fused_ln_mlp_block_int8(a, lns, lnb, wfc, bfc, wpj, bpj)
        )(xs)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m), atol=1e-5)


def test_int8_kernels_under_model_mesh():
    """int8 × tensor parallelism (VERDICT r4 #7): on a data×model mesh the
    int8 attention head-parallelizes and the int8 MLP runs the Megatron
    fc-column/proj-row split with per-shard quantization + psum'd partials.
    Both must match the unsharded int8 call. Attention is exactly equal
    (qkv column scales are per-output-column → identical per shard; wout is
    quantized over local rows, so compare by cosine); the MLP's proj scales
    likewise reduce over local E/tp rows → cosine bar."""
    import jax.numpy as jnp

    from vipant_tpu.ops.fused_attn import fused_ln_attention_block_int8
    from vipant_tpu.ops.fused_mlp import fused_ln_mlp_block_int8, fused_mlp_applicable
    from vipant_tpu.parallel import make_mesh, shard_batch

    r = np.random.default_rng(7)
    B, T, C, H = 8, 16, 64, 4
    x = jnp.asarray(r.standard_normal((B, T, C)), jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * r.standard_normal(C), jnp.float32)
    lnb = jnp.asarray(0.1 * r.standard_normal(C), jnp.float32)
    wq = jnp.asarray(r.standard_normal((C, 3 * C)) * 0.05, jnp.float32).reshape(C, 3, C)
    bq = jnp.asarray(r.standard_normal((3, C)) * 0.01, jnp.float32)
    wo = jnp.asarray(r.standard_normal((C, C)) * 0.05, jnp.float32)
    bo = jnp.asarray(r.standard_normal(C) * 0.01, jnp.float32)
    wfc = jnp.asarray(r.standard_normal((C, 4 * C)) * 0.05, jnp.float32)
    bfc = jnp.asarray(r.standard_normal(4 * C) * 0.01, jnp.float32)
    wpj = jnp.asarray(r.standard_normal((4 * C, C)) * 0.05, jnp.float32)
    bpj = jnp.asarray(r.standard_normal(C) * 0.01, jnp.float32)

    ref_a = np.asarray(
        fused_ln_attention_block_int8(x, lns, lnb, wq, bq, wo, bo, heads=H),
        np.float32,
    )
    ref_m = np.asarray(
        fused_ln_mlp_block_int8(x, lns, lnb, wfc, bfc, wpj, bpj), np.float32
    )
    mesh = make_mesh(data=2, model=2)
    with jax.sharding.set_mesh(mesh):
        assert fused_mlp_applicable(T, C, 4, int8=True), (
            "int8 MLP must stay applicable under a model mesh"
        )
        assert not fused_mlp_applicable(T, C, 4, int8=False), (
            "bf16 fused MLP must still refuse Megatron-sharded weights"
        )
        (xs,) = shard_batch((x,), mesh)
        out_a = np.asarray(
            jax.jit(
                lambda a: fused_ln_attention_block_int8(
                    a, lns, lnb, wq, bq, wo, bo, heads=H
                )
            )(xs),
            np.float32,
        )
        out_m = np.asarray(
            jax.jit(
                lambda a: fused_ln_mlp_block_int8(a, lns, lnb, wfc, bfc, wpj, bpj)
            )(xs),
            np.float32,
        )
    for out, ref in ((out_a, ref_a), (out_m, ref_m)):
        cos = (out * ref).sum(-1) / (
            np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9
        )
        assert cos.min() > 0.999, cos.min()


def test_int8_frozen_tower_forward_and_grads(monkeypatch):
    """`int8_frozen=True` routes a tower's trunk through the fwd-only int8
    kernels. A frozen tower's output is constant w.r.t. the differentiated
    params, so jax.grad over OTHER params must work (no VJP is ever needed
    through the int8 kernels), and the embeddings must match the bf16 tower
    to cosine > 0.99."""
    from jax.experimental.pallas import tpu as pltpu

    from vipant_tpu.nn.heads import VisionTower

    kw = dict(
        width=64, embed_dim=32, resolution=64, heads=4, layers=2,
        patch_size=32, dtype=jnp.float32,
    )
    x = jnp.asarray(np.random.default_rng(8).standard_normal((2, 3, 64, 64)), jnp.float32)
    ref_tower = VisionTower(**kw)
    variables = ref_tower.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(ref_tower.apply(variables, x), np.float32)

    # the dispatch gates on the TPU backend; force it + interpret kernels
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        int8_tower = VisionTower(int8_frozen=True, **kw)
        out = np.asarray(int8_tower.apply(variables, x), np.float32)
        cos = (out * ref).sum(-1) / (
            np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
        )
        assert cos.min() > 0.99, cos.min()

        # frozen-tower training pattern: grads w.r.t. params OUTSIDE the
        # tower flow fine even though the int8 kernels have no VJP
        w = jnp.ones((32,), jnp.float32)
        g = jax.grad(lambda w: jnp.sum(int8_tower.apply(variables, x) @ w))(w)
        assert np.isfinite(np.asarray(g)).all()
