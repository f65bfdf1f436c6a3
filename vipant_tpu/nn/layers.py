"""Primitive layers: fp32-island LayerNorm, QuickGELU, packed-QKV attention,
pre-LN residual attention blocks, and the Transformer backbone.

Capability parity with the CLIP primitives the reference builds everything
from (`/root/reference/clip/model.py:154-200`), designed for TPU: bf16
activations with fp32 LayerNorm statistics, one fused QKV matmul feeding
``jax.nn.dot_product_attention`` (XLA's fused attention path), and static
shapes throughout.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x·σ(1.702x) — CLIP's GELU approximation (`/root/reference/clip/model.py:163-165`)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, output cast back to the input dtype
    (the reference keeps LN in fp32 inside fp16 models,
    `/root/reference/clip/model.py:154-160`)."""

    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dim,), self.param_dtype)
        y = y * scale + bias
        return y.astype(orig_dtype)


def functional_layer_norm(x, scale, bias, eps: float = 1e-5):
    """Same math as the LayerNorm module (fp32 stats, cast back), on raw
    params — used by the fused attention sub-block's fallback path."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


class _LNParams(nn.Module):
    """Param holder with a LayerNorm-compatible tree ({scale, bias})."""

    dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
        return scale, bias


class _DenseParams(nn.Module):
    """Param holder with an ``nn.DenseGeneral``-compatible tree
    ({kernel [in, out], bias [out]}), so the packed projections can be fed
    raw into the fused attention kernel while ported checkpoints keep their
    exact param paths (attn/qkv/kernel etc.)."""

    in_features: int
    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features), self.param_dtype
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return kernel, bias


class _QKVParams(nn.Module):
    """Packed qkv projection params in TP-shardable layout:
    kernel [d, 3, d] (q|k|v sections along dim 1; flattening the last two
    dims recovers the classic [d, 3d] (q|k|v) packed layout), bias [3, d].

    Why 3D: head blocks are CONTIGUOUS on the last dim within each q/k/v
    section, so ``PartitionSpec(None, None, "model")`` shards whole head
    groups and a local reshape inside shard_map yields each shard's packed
    slice — the classic [d, 3d] layout interleaves the three sections,
    which no PartitionSpec can shard by head (parallel/mesh.py). Init draws
    the same values as the flat layout (same key, reshaped)."""

    dim: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        base = self.kernel_init

        def init3(key, shape, dtype):
            d = shape[0]
            return base(key, (d, shape[1] * shape[2]), dtype).reshape(shape)

        kernel = self.param("kernel", init3, (self.dim, 3, self.dim), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (3, self.dim), self.param_dtype)
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Packed-QKV multi-head attention (torch ``nn.MultiheadAttention``
    semantics: one [D, 3D] input projection, one [D, D] output projection),
    so ported CLIP checkpoints drop in without weight splitting.

    On TPU the self-attention path runs as ONE fused Pallas kernel
    (qkv projection + attention + output projection, ops/fused_attn.py) —
    no head-major layout ever exists, killing XLA's relayout copies.

    ``n_layers`` (when set) enables CLIP's from-scratch init scheme:
    qkv ~ N(0, d^-0.5), out ~ N(0, d^-0.5·(2L)^-0.5)
    (parity: `/root/reference/clip/model.py:330-350`,
    `/root/reference/cvap/module/txt.py:44-58`)."""

    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    n_layers: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        ln_residual: Optional[tuple] = None,
        decode_state: Optional[dict] = None,
    ) -> jnp.ndarray:
        """x: [B, T, D]; kv: optional [B, S, D] for cross-attention;
        mask: optional additive [T, S] or boolean [..., T, S] (True = keep);
        ln_residual: optional (scale, bias) — compute the full pre-LN
        residual sub-block ``x + proj(attn(LN(x)))`` (fused on TPU);
        decode_state: KV-cache for single-position autoregressive decoding —
        self-attention: {k [B,L,H,Dh], v, pos}; cross-attention: {k, v}
        (projected memory, or None values to compute-and-return them once).
        In decode mode returns (out, new_state)."""
        d = x.shape[-1]
        assert d % self.num_heads == 0
        head_dim = d // self.num_heads

        if self.n_layers:
            attn_init = nn.initializers.normal(stddev=d ** -0.5)
            proj_init = nn.initializers.normal(
                stddev=(d ** -0.5) * ((2 * self.n_layers) ** -0.5)
            )
        else:
            attn_init = proj_init = nn.initializers.lecun_normal()

        def dense(z, kernel, bias):
            y = z @ kernel.astype(self.dtype)
            return y + bias.astype(self.dtype)

        bias = None
        bool_mask = None
        if mask is not None:
            if mask.dtype == jnp.bool_:
                bool_mask = mask
                while bool_mask.ndim < 4:
                    bool_mask = bool_mask[None]
            else:
                bias = mask.astype(jnp.float32)
                while bias.ndim < 4:
                    bias = bias[None]

        if kv is None:
            wqkv3, bqkv2 = _QKVParams(
                d, kernel_init=attn_init, param_dtype=self.param_dtype, name="qkv"
            )()
            wout, bout = _DenseParams(
                d, d, kernel_init=proj_init, param_dtype=self.param_dtype, name="out"
            )()
            # classic packed 2D views for the non-fused paths (free reshape;
            # only traced in branches that use them)
            flat = lambda: (wqkv3.reshape(d, 3 * d), bqkv2.reshape(3 * d))

            if decode_state is not None:  # single-position cached self-attn
                wqkv, bqkv = flat()
                residual = x if ln_residual is not None else None
                h = functional_layer_norm(x, *ln_residual) if ln_residual else x
                q, k, v = jnp.split(dense(h, wqkv, bqkv), 3, axis=-1)
                B = x.shape[0]
                shp = (B, 1, self.num_heads, head_dim)
                q, k, v = q.reshape(shp), k.reshape(shp), v.reshape(shp)
                pos = decode_state["pos"]
                ck = jax.lax.dynamic_update_slice(
                    decode_state["k"], k.astype(decode_state["k"].dtype), (0, pos, 0, 0)
                )
                cv = jax.lax.dynamic_update_slice(
                    decode_state["v"], v.astype(decode_state["v"].dtype), (0, pos, 0, 0)
                )
                L = ck.shape[1]
                step_bias = jnp.where(
                    jnp.arange(L)[None, None, None, :] <= pos, 0.0, -1e30
                ).astype(jnp.float32)
                out = jax.nn.dot_product_attention(q, ck, cv, bias=step_bias)
                out = dense(out.reshape(B, 1, d), wout, bout)
                out = out if residual is None else residual + out
                return out, {"k": ck, "v": cv, "pos": pos + 1}

            import os

            from ..ops.fused_attn import (
                fused_attention_block,
                fused_block_applicable,
                fused_ln_attention_block,
            )
            from ..parallel.sequence import seq_axis

            T = x.shape[1]
            # Mosaic kernels lower on TPU only; CPU uses interpret mode in
            # tests via direct calls, GPU and anything else gets plain XLA.
            # Under a seq-parallel trunk (token axis sharded, seq_axis set)
            # the fused kernel would attend to local tokens only — fall
            # through to the dense-qkv path, whose attention() dispatch
            # routes to ring attention.
            if seq_axis() is None and jax.default_backend() == "tpu" and fused_block_applicable(
                T, d, self.num_heads, bool_mask is not None
            ):
                bias2d = None
                if bias is not None:
                    b = bias
                    while b.ndim > 2:
                        assert b.shape[0] == 1, "fused path expects a [T, T] bias"
                        b = b[0]
                    bias2d = b
                from ..ops.quant import int8_fwd_enabled

                if os.environ.get("VIPANT_INT8_ATTN") == "1" or int8_fwd_enabled():
                    # fwd-only int8 MXU projections: process-global for
                    # serving (InferenceEngine quantize="int8") or scoped to
                    # a frozen tower's trunk (model.image.int8_frozen);
                    # fails loudly if a cotangent ever reaches it
                    from ..ops.fused_attn import (
                        fused_attention_block_int8,
                        fused_ln_attention_block_int8,
                    )

                    if ln_residual is not None:
                        return fused_ln_attention_block_int8(
                            x, *ln_residual, wqkv3, bqkv2, wout, bout,
                            bias=bias2d, heads=self.num_heads,
                        )
                    return fused_attention_block_int8(
                        x, wqkv3, bqkv2, wout, bout, bias=bias2d,
                        heads=self.num_heads,
                    )
                if ln_residual is not None:
                    return fused_ln_attention_block(
                        x, *ln_residual, wqkv3, bqkv2, wout, bout,
                        bias=bias2d, heads=self.num_heads,
                    )
                return fused_attention_block(
                    x, wqkv3, bqkv2, wout, bout, bias=bias2d, heads=self.num_heads
                )

            residual = None
            if ln_residual is not None:
                residual = x
                x = functional_layer_norm(x, *ln_residual)
            wqkv, bqkv = flat()
            qkv = dense(x, wqkv, bqkv)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            assert ln_residual is None, "ln_residual is a self-attention feature"
            residual = None
            # cross-attention: q from x, k/v from memory — still packed
            # layout per-projection for porting symmetry
            mk = lambda name: _DenseParams(
                d, d, kernel_init=attn_init, param_dtype=self.param_dtype, name=name
            )()
            qh, kh, vh = mk("q"), mk("k"), mk("v")
            wout, bout = _DenseParams(
                d, d, kernel_init=proj_init, param_dtype=self.param_dtype, name="out"
            )()
            if decode_state is not None:  # memory k/v projected once, reused
                B, S = x.shape[0], kv.shape[1]
                if decode_state.get("k") is None:
                    mk_ = dense(kv, *kh).reshape(B, S, self.num_heads, head_dim)
                    mv_ = dense(kv, *vh).reshape(B, S, self.num_heads, head_dim)
                else:
                    mk_, mv_ = decode_state["k"], decode_state["v"]
                q = dense(x, *qh).reshape(B, 1, self.num_heads, head_dim)
                out = jax.nn.dot_product_attention(q, mk_, mv_)
                out = dense(out.reshape(B, 1, d), wout, bout)
                return out, {"k": mk_, "v": mv_}
            q = dense(x, *qh)
            k = dense(kv, *kh)
            v = dense(kv, *vh)

        B, T, _ = q.shape
        S = k.shape[1]
        q = q.reshape(B, T, self.num_heads, head_dim)
        k = k.reshape(B, S, self.num_heads, head_dim)
        v = v.reshape(B, S, self.num_heads, head_dim)

        from ..ops.attention import attention

        out = attention(q, k, v, bias=bias, mask=bool_mask)  # [B, T, H, head_dim]
        out = out.reshape(B, T, d)
        out = dense(out, wout, bout)
        return out if residual is None else residual + out


class MLP(nn.Module):
    """4×-expansion MLP with QuickGELU (CLIP) or exact GELU (DeiT).
    ``n_layers`` enables CLIP's depth-scaled from-scratch init.

    With ``ln_residual`` the whole pre-LN sub-block x + proj(act(fc(LN(x))))
    runs as one fused Pallas kernel on TPU (the [T, 4C] intermediate never
    leaves VMEM)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    expansion: int = 4
    act: str = "quick_gelu"
    n_layers: Optional[int] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, ln_residual: Optional[tuple] = None
    ) -> jnp.ndarray:
        d = x.shape[-1]
        if self.n_layers:
            fc_init = nn.initializers.normal(stddev=(2 * d) ** -0.5)
            proj_init = nn.initializers.normal(
                stddev=(d ** -0.5) * ((2 * self.n_layers) ** -0.5)
            )
        else:
            fc_init = proj_init = nn.initializers.lecun_normal()

        wfc, bfc = _DenseParams(
            d, self.expansion * d, kernel_init=fc_init,
            param_dtype=self.param_dtype, name="fc",
        )()
        wproj, bproj = _DenseParams(
            self.expansion * d, d, kernel_init=proj_init,
            param_dtype=self.param_dtype, name="proj",
        )()

        if ln_residual is not None:
            # NOTE: routing training through the fused MLP kernel measured
            # SLOWER end-to-end (617 vs 675 clips/s): XLA's MLP matmuls are
            # already at the roofline and the kernel's flash-style backward
            # recompute costs more than the [T,4C] HBM round-trip it saves.
            # Kept opt-in for forward-only workloads (eval/serving).
            import os

            from ..ops.fused_mlp import (
                fused_ln_mlp_block,
                fused_ln_mlp_block_int8,
                fused_mlp_applicable,
            )
            from ..ops.quant import int8_fwd_enabled

            int8_ctx = int8_fwd_enabled()  # frozen-tower scope (quant.py)
            want_int8 = os.environ.get("VIPANT_INT8_MLP") == "1" or int8_ctx
            if (
                (os.environ.get("VIPANT_FUSED_MLP") == "1" or int8_ctx)
                and jax.default_backend() == "tpu"
                and fused_mlp_applicable(x.shape[1], d, self.expansion,
                                         int8=want_int8)
            ):
                if want_int8:
                    # fwd-only int8 MXU path (serving quantize="int8", or a
                    # frozen tower's trunk): no VJP — differentiating
                    # through it fails loudly, which is correct
                    return fused_ln_mlp_block_int8(
                        x, *ln_residual, wfc, bfc, wproj, bproj, act=self.act
                    )
                return fused_ln_mlp_block(
                    x, *ln_residual, wfc, bfc, wproj, bproj, act=self.act
                )
            residual = x
            x = functional_layer_norm(x, *ln_residual)
        else:
            residual = None

        h = x @ wfc.astype(self.dtype) + bfc.astype(self.dtype)
        h = quick_gelu(h) if self.act == "quick_gelu" else jax.nn.gelu(h, approximate=False)
        out = h @ wproj.astype(self.dtype) + bproj.astype(self.dtype)
        return out if residual is None else residual + out


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block: x + attn(ln1(x)); x + mlp(ln2(x)).
    Optional cross-attention sub-block (for the captioning decoder,
    mirroring `/root/reference/cvap/module/transformer.py:38-75`)."""

    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    cross_attn: bool = False
    act: str = "quick_gelu"
    n_layers: Optional[int] = None  # enables CLIP's depth-scaled init

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        memory: Optional[jnp.ndarray] = None,
        decode_state: Optional[dict] = None,
    ) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, n_layers=self.n_layers)
        # ln_1 + attention + residual run as one fused sub-block on TPU;
        # the param holder keeps LayerNorm's exact tree (ln_1/{scale,bias})
        ln1 = _LNParams(x.shape[-1], param_dtype=self.param_dtype, name="ln_1")()
        attn = MultiHeadAttention(self.num_heads, name="attn", **kw)
        new_state = None
        if decode_state is not None:  # KV-cached single-position decode
            x, self_state = attn(
                x, ln_residual=ln1, decode_state=decode_state["self"]
            )
            new_state = {"self": self_state}
        else:
            x = attn(x, mask=mask, ln_residual=ln1)
        if self.cross_attn:
            assert memory is not None, "cross-attention block requires memory"
            cross = MultiHeadAttention(self.num_heads, name="cross_attn", **kw)
            h = LayerNorm(param_dtype=self.param_dtype, name="ln_c")(x)
            if decode_state is not None:
                y, mem_state = cross(h, kv=memory, decode_state=decode_state["mem"])
                x = x + y
                new_state["mem"] = mem_state
            else:
                x = x + cross(h, kv=memory)
        ln2 = _LNParams(x.shape[-1], param_dtype=self.param_dtype, name="ln_2")()
        x = MLP(name="mlp", act=self.act, **kw)(x, ln_residual=ln2)
        return x if new_state is None else (x, new_state)


def causal_mask(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive [n, n] causal mask (−inf above the diagonal)."""
    return jnp.triu(jnp.full((n, n), -jnp.inf, dtype=dtype), k=1)


def pack_tokens(h: jnp.ndarray, k: int):
    """Token packing: ([B, T, C], k) → ([B/k, kT, C], additive [kT, kT]
    block-diagonal mask). Attention behind the mask is EXACTLY k separate
    attentions (softmax rows never mix items; LN/MLP are token-wise), but
    short sequences stop wasting MXU lane tiles (docs/performance.md
    round-3 token-packing entry). Composes additively with the causal mask
    into per-segment causal attention."""
    B, T, C = h.shape
    assert B % k == 0, f"batch {B} not divisible by pack {k}"
    eye = jnp.eye(k, dtype=jnp.float32)
    bias = jnp.kron(1.0 - eye, jnp.ones((T, T), jnp.float32)) * -1e30
    return h.reshape(B // k, k * T, C), bias


class StackedTransformer(nn.Module):
    """``Transformer``'s pipeline-parallel twin: the same residual-block
    stack, but every layer's parameters live stacked on a leading ``[L]``
    axis under one ``blocks`` param — so a ``pipe`` mesh axis can shard
    whole layers (GPipe, ``parallel/pipeline.py``). Execution statically
    unrolls the layers (both here and per pipeline stage): a Pallas kernel
    inside a ``lax.scan``/``while`` body exceeds XLA's scoped-vmem
    accounting on real TPUs.

    Same math as the unrolled ``Transformer`` given converted params
    (``parallel.pipeline.stack_block_tree``); pinned in
    ``tests/test_pipeline.py``. No reference counterpart — the reference
    scales by DDP only (`/root/reference/train.py:17-35`)."""

    layers: int
    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    act: str = "quick_gelu"
    clip_init: Optional[bool] = None
    pipe_microbatches: Optional[int] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        use_clip_init = (
            self.clip_init if self.clip_init is not None else self.act == "quick_gelu"
        )
        blk = ResidualAttentionBlock(
            num_heads=self.num_heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            act=self.act,
            n_layers=self.layers if use_clip_init else None,
        )
        dummy = jnp.zeros((1, 1, x.shape[-1]), self.dtype)

        def init_fn(rng):
            rs = jax.random.split(rng, self.layers)
            return jax.vmap(lambda r: blk.init(r, dummy)["params"])(rs)

        stack = self.param("blocks", init_fn)

        def stage(p, h, m=None):
            return blk.apply({"params": p}, h, m)

        if self.remat:
            stage = jax.checkpoint(stage)

        from ..parallel.pipeline import gpipe, pipe_mesh_info
        from ..parallel.sequence import seq_context, seq_mesh_info
        from ..parallel.spmd import smap

        mesh, S = pipe_mesh_info()
        smesh, Sq = seq_mesh_info()
        seq_mask_ok = mask is None or (
            mask.ndim == 2 and mask.dtype != jnp.bool_
            and mask.shape[0] % Sq == 0
        )
        if Sq > 1 and not (seq_mask_ok and x.shape[1] % Sq == 0):
            # a seq axis > 1 with a disqualifying mask/shape silently
            # replicates this trunk's compute S-fold on the unsharded path —
            # surface it at trace time (once per call site via warnings dedup)
            import warnings

            why = (
                f"token count {x.shape[1]} % seq={Sq} != 0"
                if seq_mask_ok
                else f"mask shape/dtype {getattr(mask, 'shape', None)}/"
                f"{getattr(mask, 'dtype', None)} (need additive 2-D, rows % {Sq} == 0)"
            )
            warnings.warn(
                f"seq-parallel trunk disqualified ({why}); running the "
                f"UNSHARDED sequential path — compute replicates {Sq}x over "
                f"the seq axis",
                stacklevel=2,
            )
        if Sq > 1 and seq_mask_ok and x.shape[1] % Sq == 0:
            # sequence parallelism: tokens shard over `seq`; every stage op
            # is token-wise except attention, which the seq_context reroutes
            # to ring attention (parallel/sequence.py). Additive 2D masks
            # (causal text, token packing) shard their QUERY rows over the
            # ring — each device keeps its [T/S, T] rows and slices the key
            # block per ring step (ring_attention bias support); boolean or
            # batched masks fall through to the dense paths.
            assert S <= 1, "seq and pipe cannot shard the same trunk"
            msize = (
                int(smesh.shape.get("model", 1))
                if "model" in smesh.axis_names
                else 1
            )
            # the ring's in_specs replicate params: a model-sharded trunk
            # would silently all-gather its Megatron slices every step
            assert msize <= 1, "seq and model cannot shard the same trunk"
            from jax.sharding import PartitionSpec as P

            def run(p_all, h, *m_local):
                m_l = m_local[0] if m_local else None
                with seq_context("seq"):
                    for i in range(self.layers):
                        p_i = jax.tree_util.tree_map(lambda v, i=i: v[i], p_all)
                        h = stage(p_i, h, m_l)
                return h

            dsz = int(smesh.shape.get("data", 1)) if "data" in smesh.axis_names else 1
            xspec = P("data" if dsz > 1 else None, "seq")
            in_specs = (P(), xspec) + ((P("seq", None),) if mask is not None else ())
            margs = (mask,) if mask is not None else ()
            return smap(run, smesh, in_specs, xspec)(stack, x, *margs)
        if S > 1 and self.layers % S == 0:
            consts = () if mask is None else (mask,)
            fn = stage if mask is not None else (lambda p, h: stage(p, h, None))
            return gpipe(
                fn, stack, x, mesh=mesh,
                n_micro=self.pipe_microbatches, consts=consts,
            )
        # sequential path: STATIC unroll — a Pallas kernel inside a
        # lax.scan/while body exceeds XLA's scoped-vmem accounting on TPU
        # (same constraint as gpipe's per-stage unroll, parallel/pipeline.py)
        for i in range(self.layers):
            p_i = jax.tree_util.tree_map(lambda v, i=i: v[i], stack)
            x = stage(p_i, x, mask)
        return x


class Transformer(nn.Module):
    """Stack of residual attention blocks with optional gradient
    rematerialization (jax.checkpoint) for long-sequence audio towers."""

    layers: int
    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    cross_attn: bool = False
    remat: bool = False
    act: str = "quick_gelu"
    # CLIP depth-scaled from-scratch init; None = on for CLIP-style
    # (quick_gelu) stacks, off for DeiT-style (exact gelu)
    clip_init: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        memory: Optional[jnp.ndarray] = None,
        decode_state: Optional[tuple] = None,
    ) -> jnp.ndarray:
        use_clip_init = (
            self.clip_init if self.clip_init is not None else self.act == "quick_gelu"
        )
        block_cls = ResidualAttentionBlock
        if self.remat:
            block_cls = nn.remat(ResidualAttentionBlock, static_argnums=())
        new_states = []
        for i in range(self.layers):
            block = block_cls(
                num_heads=self.num_heads,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                cross_attn=self.cross_attn,
                act=self.act,
                n_layers=self.layers if use_clip_init else None,
                name=f"block_{i}",
            )
            if decode_state is not None:
                x, st = block(x, mask, memory, decode_state=decode_state[i])
                new_states.append(st)
            else:
                x = block(x, mask, memory)
        return x if decode_state is None else (x, tuple(new_states))
