"""Gradient cache: two-pass large-batch contrastive training.

The reference's released "+AT w/ GC" checkpoints were trained with gradient
caching, but the implementation is absent from its code — only checkpoint
names remain (`/root/reference/README.md:36,43`,
`/root/reference/cvap/monitor/audioset_clf.py:73`; SURVEY.md §2.8). This is
the first-class TPU implementation:

1. **Embedding pass** (no grad): encode the full batch chunk-by-chunk under
   ``lax.map`` — activations for only one chunk live at a time.
2. **Loss pass**: differentiate the (global-negative) contrastive loss with
   respect to the cached embeddings and the loss-head params.
3. **Re-forward VJP pass**: ``lax.scan`` over chunks, re-encoding each chunk
   and pulling the cached embedding cotangent back to encoder params,
   accumulating grads.

Everything is one jitted function — no retracing per chunk (SURVEY.md §7
hard-part 4) — and composes with batch sharding over the mesh: each pass is
plain global-batch math, so XLA still inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _tree_zeros_like(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def _chunk(x: jnp.ndarray, n_chunks: int) -> jnp.ndarray:
    b = x.shape[0]
    assert b % n_chunks == 0, f"batch {b} not divisible into {n_chunks} chunks"
    return x.reshape(n_chunks, b // n_chunks, *x.shape[1:])


def grad_cache_value_and_grad(
    encode_a: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    encode_b: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    loss_of_embs: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    n_chunks: int,
):
    """Returns ``f(params, batch_a, batch_b) -> (loss, grads)`` with the
    memory profile of ``batch/n_chunks`` activations.

    * ``encode_a(params, xa_chunk, chunk_idx)`` / ``encode_b`` produce
      embeddings; ``chunk_idx`` lets stochastic encoders (dropout/patchout)
      fold per-chunk randomness — the SAME index is passed in the embedding
      pass and the re-forward pass, which is what keeps the cached gradients
      exact.
    * ``loss_of_embs(params, emb_a, emb_b)`` computes the contrastive loss
      over the **full** embedding matrices (global negatives) — loss-head
      params (logit_scale …) are read from the same ``params``.

    Gradients are exact: d loss/d params =
    Σ_chunks VJP(encoder, chunk) · d loss/d emb + ∂ loss/∂ loss-params.
    """

    def f(params, batch_a, batch_b):
        ca = _chunk(batch_a, n_chunks)
        cb = _chunk(batch_b, n_chunks)
        idxs = jnp.arange(n_chunks)

        # 1. cached embeddings, chunked (no grad)
        emb_a = jax.lax.map(lambda ci: encode_a(params, ci[0], ci[1]), (ca, idxs))
        emb_b = jax.lax.map(lambda ci: encode_b(params, ci[0], ci[1]), (cb, idxs))
        ea = emb_a.reshape(-1, emb_a.shape[-1])
        eb = emb_b.reshape(-1, emb_b.shape[-1])

        # 2. loss grads wrt embeddings and loss-head params
        loss, (d_params_loss, d_ea, d_eb) = jax.value_and_grad(
            loss_of_embs, argnums=(0, 1, 2)
        )(params, ea, eb)
        d_ea = d_ea.reshape(emb_a.shape)
        d_eb = d_eb.reshape(emb_b.shape)

        # 3. re-forward each chunk with VJP, accumulate encoder grads
        def body(acc, inp):
            xa, xb, cta, ctb, idx = inp
            _, vjp_a = jax.vjp(lambda p: encode_a(p, xa, idx), params)
            _, vjp_b = jax.vjp(lambda p: encode_b(p, xb, idx), params)
            g = _tree_add(vjp_a(cta)[0], vjp_b(ctb)[0])
            return _tree_add(acc, g), None

        enc_grads, _ = jax.lax.scan(
            body, _tree_zeros_like(params), (ca, cb, d_ea, d_eb, idxs)
        )
        grads = _tree_add(enc_grads, d_params_loss)
        return loss, grads

    return f
