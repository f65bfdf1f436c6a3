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
