"""Jitted train/eval steps over the mesh.

One SPMD program: params replicated (model axis reserved for tower
sharding), batch sharded along ``data``. The contrastive loss is written
over the global batch, so XLA inserts the feature all-gather on ICI —
reference ``dp``-mode semantics (`/root/reference/cvap/model/cvap.py:28-39`)
at arbitrary scale, which its ``ddp`` mode lacked (SURVEY.md §2.8).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..nn.tying import restore_tied
from ..optim.partition import merge_params
from .state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    ties: Sequence[Tuple[str, str]] = (),
    has_batch_stats: bool = False,
    loss_adapter: Optional[Callable] = None,
    donate: bool = True,
    constrain: Optional[Callable] = None,
):
    """Build a jitted ``(state, *batch) -> (state, metrics)`` step.

    ``loss_adapter(model, variables, batch, rngs)`` returns
    ``loss`` or ``(loss, aux)`` or ``((loss, aux), mutated_vars)`` when
    batch_stats are mutable; defaults to ``model.apply(variables, *batch)``.

    Frozen towers live in ``state.frozen_params`` (see
    :mod:`vipant_tpu.optim.partition`): they are outside the differentiated
    function — XLA never builds their backward graphs — and outside the
    optimizer state, and being a step *argument* (not a closure constant)
    they are never baked into the HLO as literals.
    """
    ties = tuple(ties)

    def default_adapter(model, variables, batch, rngs):
        mutable = ["batch_stats"] if has_batch_stats else False
        out = model.apply(variables, *batch, train=True, rngs=rngs, mutable=mutable)
        return out

    adapter = loss_adapter or default_adapter

    def loss_fn(params, frozen_params, batch_stats, batch, rngs):
        params_full = merge_params(params, frozen_params) if frozen_params is not None else params
        params_full = restore_tied(params_full, ties) if ties else params_full
        variables = {"params": params_full}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
        out = adapter(model, variables, batch, rngs)
        new_stats = None
        if has_batch_stats:
            out, mutated = out
            new_stats = mutated.get("batch_stats", batch_stats)
        if isinstance(out, tuple):
            loss, aux = out
        else:
            loss, aux = out, {}
        return loss, (aux, new_stats)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, *batch):
        rng, new_rng = jax.random.split(state.rng)
        rngs = {"dropout": rng, "patchout": jax.random.fold_in(rng, 1)}
        (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.frozen_params, state.batch_stats, batch, rngs
        )
        new_state = state.apply_gradients(
            tx,
            grads,
            batch_stats=new_stats if has_batch_stats else state.batch_stats,
            rng=new_rng,
        )
        if constrain is not None:
            # ZeRO: pin the output state to its input placement (params
            # replicated, opt moments data-sharded) so the donation
            # round-trip is stable and GSPMD lowers the grad all-reduce to
            # reduce-scatter + update all-gather (parallel/zero.py)
            new_state = constrain(new_state)
        metrics = {"loss": loss, **{f"loss_{k}": v for k, v in aux.items()}}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_grad_cache_step(
    model,
    tx: optax.GradientTransformation,
    n_chunks: int,
    method_a: str = "encode_audio",
    method_b: str = "encode_text",
    ties: Sequence[Tuple[str, str]] = (),
    preprocess_a: Optional[Callable] = None,
    preprocess_b: Optional[Callable] = None,
    constrain: Optional[Callable] = None,
):
    """Two-pass gradient-cache train step (the "+AT w/ GC" capability;
    see :mod:`vipant_tpu.parallel.grad_cache`): activation memory scales
    with batch/n_chunks while the contrastive loss keeps the full
    global-negative similarity matrix. ``state.params`` holds trainables;
    frozen towers ride ``state.frozen_params`` (traced, not baked).
    ``preprocess_a(batch_a, rng)``: optional in-step transform of the first
    stream (e.g. the on-device audio frontend)."""
    from ..parallel.grad_cache import grad_cache_value_and_grad

    ties = tuple(ties)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch_a, batch_b):
        rng, new_rng = jax.random.split(state.rng)
        if preprocess_a is not None:
            batch_a = preprocess_a(batch_a, rng)
        if preprocess_b is not None:
            batch_b = preprocess_b(batch_b, jax.random.fold_in(rng, 2))

        def full(tp):
            p = (
                merge_params(tp, state.frozen_params)
                if state.frozen_params is not None
                else tp
            )
            return restore_tied(p, ties) if ties else p

        def _chunk_rngs(idx):
            # per-chunk randomness, identical between the embedding pass and
            # the re-forward VJP pass (exactness), distinct across chunks
            base = jax.random.fold_in(rng, 3)
            key = jax.random.fold_in(base, idx)
            return {
                "dropout": jax.random.fold_in(key, 0),
                "patchout": jax.random.fold_in(key, 1),
            }

        def encode_a(tp, chunk, idx):
            return model.apply(
                {"params": full(tp)}, chunk, method=method_a, train=True,
                rngs=_chunk_rngs(idx),
            )

        def encode_b(tp, chunk, idx):
            return model.apply(
                {"params": full(tp)}, chunk, method=method_b, train=True,
                rngs=_chunk_rngs(jax.lax.add(idx, n_chunks)),
            )

        def loss_of_embs(tp, ea, eb):
            return model.apply(
                {"params": full(tp)},
                ea,
                eb,
                method=lambda m, a, b: m.loss(a, b, normalized=True),
            )

        f = grad_cache_value_and_grad(encode_a, encode_b, loss_of_embs, n_chunks)
        loss, grads = f(state.params, batch_a, batch_b)
        new_state = state.apply_gradients(tx, grads, rng=new_rng)
        if constrain is not None:
            new_state = constrain(new_state)  # ZeRO placement pin (see above)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step


def make_eval_step(model, ties: Sequence[Tuple[str, str]] = (), method: Optional[str] = None):
    """Jitted feature-extraction step for evaluation (no grad)."""
    ties = tuple(ties)

    @jax.jit
    def eval_step(variables, *batch):
        if ties:
            variables = dict(variables)
            variables["params"] = restore_tied(variables["params"], ties)
        kwargs = {"train": False}
        if method is not None:
            return model.apply(variables, *batch, method=method, **kwargs)
        return model.apply(variables, *batch, method="features", **kwargs)

    return eval_step
