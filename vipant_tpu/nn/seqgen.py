"""SeqGenerationHead: causal text decoder cross-attending into audio
features, with jit-able greedy decoding.

Capability parity with the reference's captioning head
(`/root/reference/cvap/module/encoder/text_head.py:47-129`): audio grid
features are projected into the text width (``to_txt``), pooled over the
frequency axis, layer-normed, and used as cross-attention memory; training
returns (pooled text embedding, next-token logits); inference decodes
greedily. The reference's python decode loop becomes a ``lax.scan`` over a
fixed-length ids buffer with full-context re-forward per step (static
shapes under jit).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, Transformer, causal_mask

Dtype = Any


class SeqGenerationHead(nn.Module):
    width: int = 512
    layers: int = 12
    heads: int = 8
    ctx_len: int = 77
    vocab_size: int = 49408
    embed_dim: int = 512
    mem_width: int = 768
    max_len_dec: int = 32
    bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        scale = self.width ** -0.5
        self.token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.vocab_size, self.width),
            self.param_dtype,
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.ctx_len, self.width),
            self.param_dtype,
        )
        self.to_txt = self.param(
            "to_txt",
            nn.initializers.normal(stddev=scale),
            (self.mem_width, self.width),
            self.param_dtype,
        )
        self.mem_ln = LayerNorm(param_dtype=self.param_dtype, name="mem_ln")
        self.transformer = Transformer(
            layers=self.layers,
            num_heads=self.heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            cross_attn=True,
            name="transformer",
        )
        self.ln_final = LayerNorm(param_dtype=self.param_dtype, name="ln_final")
        self.predictor = nn.Dense(
            self.vocab_size,
            use_bias=self.bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="predictor",
        )
        self.text_proj = self.param(
            "text_proj",
            nn.initializers.normal(stddev=scale),
            (self.width, self.embed_dim),
            self.param_dtype,
        )

    def _memory(self, audio_feat: jnp.ndarray, time_first: bool = True) -> jnp.ndarray:
        """audio_feat: [B, rows, cols, D_mem] → [B, T_mem, width]."""
        m = audio_feat.astype(self.dtype) @ self.to_txt.astype(self.dtype)
        m = m.mean(axis=2) if time_first else m.mean(axis=1)
        return self.mem_ln(m)

    def _features(self, ids: jnp.ndarray, memory: jnp.ndarray) -> jnp.ndarray:
        x = self.token_embedding[ids].astype(self.dtype)
        x = x + self.positional_embedding[: x.shape[1]].astype(self.dtype)
        x = self.transformer(x, mask=causal_mask(x.shape[1]), memory=memory)
        return self.ln_final(x)

    def __call__(
        self,
        ids: jnp.ndarray,
        audio_feat: jnp.ndarray,
        time_first: bool = True,
        normalized: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Training path: returns (pooled embedding z, logits[:, :-1])."""
        memory = self._memory(audio_feat, time_first)
        h = self._features(ids, memory)
        logits = self.predictor(h)[:, :-1]
        eot = jnp.argmax(ids, axis=-1)
        z = jnp.take_along_axis(h, eot[:, None, None], axis=1)[:, 0]
        z = z @ self.text_proj.astype(z.dtype)
        if normalized:
            z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return z, logits

    def greedy_decode(
        self,
        audio_feat: jnp.ndarray,
        sot_token: int = 49406,
        time_first: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Greedy decoding under jit: returns (ids [B, max_len_dec+1],
        logits [B, max_len_dec, vocab])."""
        memory = self._memory(audio_feat, time_first)
        B = audio_feat.shape[0]
        L = self.max_len_dec
        ids0 = jnp.full((B, L + 1), 0, dtype=jnp.int32).at[:, 0].set(sot_token)

        def step(ids, t):
            h = self._features(ids[:, :-1], memory)  # [B, L, width]
            logits_t = self.predictor(
                jnp.take_along_axis(h, jnp.full((B, 1, 1), t, jnp.int32), axis=1)
            )[:, 0]
            nxt = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
            ids = jax.lax.dynamic_update_slice_in_dim(
                ids, nxt[:, None], t + 1, axis=1
            )
            return ids, logits_t

        ids, logits = jax.lax.scan(step, ids0, jnp.arange(L))
        return ids, jnp.transpose(logits, (1, 0, 2))

    def greedy_decode_kv(
        self,
        audio_feat: jnp.ndarray,
        sot_token: int = 49406,
        time_first: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """KV-cached greedy decoding: each step forwards ONE token through
        the decoder, appending its self-attention keys/values to per-layer
        caches; the cross-attention memory projections are computed once at
        step 0 and reused. Produces exactly the same ids as
        :meth:`greedy_decode` at O(L) instead of O(L^2) token-forwards."""
        memory = self._memory(audio_feat, time_first)
        B = audio_feat.shape[0]
        L = self.max_len_dec
        hd = self.width // self.heads

        def init_self():
            z = jnp.zeros((B, L, self.heads, hd), self.dtype)
            return {"k": z, "v": z, "pos": jnp.int32(0)}

        def one_step(tok, pos, states):
            x = self.token_embedding[tok][:, None, :].astype(self.dtype)
            x = x + self.positional_embedding[pos][None, None].astype(self.dtype)
            x, states = self.transformer(x, memory=memory, decode_state=states)
            logits = self.predictor(self.ln_final(x))[:, 0]
            return logits, states

        ids = jnp.full((B, L + 1), 0, jnp.int32).at[:, 0].set(sot_token)
        # step 0 runs outside the scan: it projects the cross-attention
        # memory (the carry's pytree structure must not change inside scan)
        states = tuple({"self": init_self(), "mem": {"k": None, "v": None}} for _ in range(self.layers))
        logits0, states = one_step(ids[:, 0], jnp.int32(0), states)
        ids = ids.at[:, 1].set(jnp.argmax(logits0, axis=-1).astype(jnp.int32))

        def step(carry, t):
            ids, states = carry
            tok = jax.lax.dynamic_slice_in_dim(ids, t, 1, axis=1)[:, 0]
            logits, states = one_step(tok, t, states)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            ids = jax.lax.dynamic_update_slice_in_dim(ids, nxt[:, None], t + 1, axis=1)
            return (ids, states), logits

        (ids, _), logits_rest = jax.lax.scan(step, (ids, states), jnp.arange(1, L))
        logits = jnp.concatenate(
            [logits0[:, None], jnp.transpose(logits_rest, (1, 0, 2))], axis=1
        )
        return ids, logits

    def beam_decode_kv(
        self,
        audio_feat: jnp.ndarray,
        beam: int = 4,
        sot_token: int = 49406,
        eot_token: int = 49407,
        time_first: bool = True,
        length_penalty: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """KV-cached beam search (beyond the reference's greedy-only
        decoder): ``beam`` hypotheses per item folded into the batch axis,
        per-layer caches gathered on beam reorder, finished hypotheses
        extend only with ``eot`` at zero cost. Returns (ids [B, L+1] of the
        best beam, its length-penalized log-prob [B]).

        ``length_penalty`` alpha applies GNMT-style ((5+len)/6)^alpha
        normalization at the final ranking (0 = pure log-prob)."""
        memory = self._memory(audio_feat, time_first)
        B = audio_feat.shape[0]
        K, L, V = int(beam), self.max_len_dec, self.vocab_size
        hd = self.width // self.heads
        BK = B * K

        memory = jnp.repeat(memory, K, axis=0)  # [B*K, T_mem, width]

        def init_self():
            z = jnp.zeros((BK, L, self.heads, hd), self.dtype)
            return {"k": z, "v": z, "pos": jnp.int32(0)}

        def one_step(tok, pos, states):
            x = self.token_embedding[tok][:, None, :].astype(self.dtype)
            x = x + self.positional_embedding[pos][None, None].astype(self.dtype)
            x, states = self.transformer(x, memory=memory, decode_state=states)
            logits = self.predictor(self.ln_final(x))[:, 0]
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), states

        ids = jnp.full((BK, L + 1), 0, jnp.int32).at[:, 0].set(sot_token)
        states = tuple(
            {"self": init_self(), "mem": {"k": None, "v": None}}
            for _ in range(self.layers)
        )
        logp0, states = one_step(ids[:, 0], jnp.int32(0), states)
        # beams start identical: keep only beam 0 alive so the first top-k
        # yields K distinct continuations, not K copies of the argmax
        beam_mask = jnp.where(jnp.arange(K) == 0, 0.0, -jnp.inf)
        scores = beam_mask[None, :].repeat(B, axis=0)  # [B, K]
        finished = jnp.zeros((B, K), bool)

        def gather_beams(tree, flat_idx):
            return jax.tree_util.tree_map(
                lambda a: jnp.take(a, flat_idx, axis=0)
                if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == BK
                else a,
                tree,
            )

        def select(carry, logp, t):
            ids, states, scores, finished = carry
            lp = logp.reshape(B, K, V)
            # finished hypotheses: only eot continues, at zero cost
            frozen = jnp.full((V,), -jnp.inf).at[eot_token].set(0.0)
            lp = jnp.where(finished[..., None], frozen[None, None], lp)
            total = scores[..., None] + lp  # [B, K, V]
            flat = total.reshape(B, K * V)
            scores, top = jax.lax.top_k(flat, K)  # [B, K]
            src_beam = top // V  # [B, K]
            token = (top % V).astype(jnp.int32)
            flat_src = (jnp.arange(B)[:, None] * K + src_beam).reshape(-1)
            ids = jnp.take(ids, flat_src, axis=0)
            states = gather_beams(states, flat_src)
            finished = jnp.take_along_axis(finished, src_beam, axis=1)
            ids = jax.lax.dynamic_update_slice_in_dim(
                ids, token.reshape(-1)[:, None], t + 1, axis=1
            )
            finished = finished | (token == eot_token)
            return ids, states, scores, finished

        carry = select((ids, states, scores, finished), logp0, 0)

        def step(carry, t):
            ids, states, scores, finished = carry
            tok = jax.lax.dynamic_slice_in_dim(ids, t, 1, axis=1)[:, 0]
            logp, states = one_step(tok, t, states)
            return select((ids, states, scores, finished), logp, t), None

        (ids, _, scores, finished), _ = jax.lax.scan(
            step, carry, jnp.arange(1, L)
        )
        # GNMT length penalty over generated length (first eot position)
        is_eot = ids[:, 1:].reshape(B, K, L) == eot_token
        lengths = jnp.where(
            is_eot.any(axis=-1), is_eot.argmax(axis=-1) + 1, L
        ).astype(jnp.float32)
        norm = ((5.0 + lengths) / 6.0) ** length_penalty
        ranked = scores / norm
        best = jnp.argmax(ranked, axis=1)  # [B]
        flat_best = jnp.arange(B) * K + best
        return jnp.take(ids, flat_best, axis=0), jnp.take_along_axis(
            ranked, best[:, None], axis=1
        )[:, 0]
