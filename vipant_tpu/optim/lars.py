"""LARS optimizer + schedules as optax transforms.

Semantics parity with the reference's LARS
(`/root/reference/cvap/module/lars.py:24-72`): trust-ratio adaptation
``q = η·‖p‖/‖∇+λp‖`` and weight decay applied only to >1-dim params
(bias/gain params are excluded from both), heavyweight momentum, and two
learning-rate groups — weights at ``lr·lr_weight``, biases/gains at
``lr·lr_bias`` — driven by the warmup+cosine schedule with
``base_lr = batch_size/256`` scaling (`/root/reference/cvap/module/lars.py:9-22`).
"""

from __future__ import annotations

import math
import re
from typing import Callable, NamedTuple, Optional

_BLOCK_IDX_RE = re.compile(r"^block_\d+$")

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_lr(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
    end_lr_ratio: float = 0.001,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """The reference's ``adjust_learning_rate`` curve
    (`/root/reference/cvap/module/lars.py:9-22`): linear warmup to
    ``base_lr``, then cosine to ``base_lr·end_lr_ratio``."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        t = jnp.maximum(total_steps - warmup_steps, 1)
        # clamp past the schedule end: without it cos(pi*s/t) passes pi and
        # the LR climbs back up if training runs longer than total_steps
        # (resume with a changed steps_per_epoch, extra fine-tune steps)
        s = jnp.clip(step - warmup_steps, 0, t)
        q = 0.5 * (1.0 + jnp.cos(jnp.pi * s / t))
        end_lr = base_lr * end_lr_ratio
        cos = base_lr * q + end_lr * (1.0 - q)
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_multistep_lr(
    base_lr: float,
    warmup_steps: int,
    milestones_steps: tuple = (),
    gamma: float = 0.5,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Linear warmup then MultiStepLR decay (the reference's Adam path:
    warmup in the monitor loop `/root/reference/cvap/monitor/cvap.py:175-186`
    + ``MultiStepLR`` from config)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / jnp.maximum(warmup_steps, 1)
        decay = jnp.asarray(1.0, jnp.float32)
        for m in milestones_steps:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return jnp.where(step < warmup_steps, jnp.minimum(warm, base_lr), base_lr * decay)

    return schedule


class LarsState(NamedTuple):
    momentum: optax.Updates
    count: jnp.ndarray


def lars(
    lr_fn: Callable[[jnp.ndarray], jnp.ndarray],
    lr_weight: float = 0.2,
    lr_bias: float = 0.0048,
    momentum: float = 0.9,
    eta: float = 0.001,
    weight_decay: float = 1e-6,
    stacked_key: str = "blocks",
) -> optax.GradientTransformation:
    """LARS over a params pytree; per-leaf group by ndim (>1 = weight).

    Leaves under a ``stacked_key`` subtree (the pipeline-stacked trunk,
    nn.layers.StackedTransformer) carry a leading layer axis: grouping uses
    ``ndim - 1`` and trust-ratio norms are computed per layer slice, so the
    update is numerically identical to LARS over the unrolled layout
    (pinned in ``tests/test_pipeline.py``)."""

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return LarsState(momentum=zeros, count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params):
        assert params is not None, "lars requires params"
        lr = lr_fn(state.count)

        def new_v(path, g, p, v):
            keys = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
            # a stacked pipeline trunk has a `blocks` ancestor but no
            # unrolled `block_{i}` one — the DeiT tower nests its UNROLLED
            # trunk under the same `blocks` name (nn/deit.py) and must keep
            # plain per-tensor LARS semantics
            is_stacked = (
                stacked_key in keys
                and not any(_BLOCK_IDX_RE.match(k) for k in keys)
            )
            ndim = p.ndim - (1 if is_stacked else 0)
            # bias/gain leaves go in the no-adaptation group regardless of
            # storage rank (the reference's `exclude_bias_or_norm` is
            # `p.ndim == 1`, `/root/reference/cvap/module/lars.py:6-7`; the
            # TP-shardable qkv bias is stored [3, C] — nn.layers._QKVParams)
            is_gain = keys and keys[-1] in ("bias", "scale")
            if ndim > 1 and not is_gain:
                d = g + weight_decay * p
                if is_stacked:
                    axes = tuple(range(1, p.ndim))
                    p_norm = jnp.sqrt(jnp.sum(jnp.square(p), axes, keepdims=True))
                    d_norm = jnp.sqrt(jnp.sum(jnp.square(d), axes, keepdims=True))
                else:
                    p_norm = jnp.linalg.norm(p)
                    d_norm = jnp.linalg.norm(d)
                q = jnp.where(
                    (p_norm > 0.0) & (d_norm > 0.0),
                    eta * p_norm / jnp.maximum(d_norm, 1e-12),
                    1.0,
                )
                local_lr = lr * lr_weight * q
            else:
                d = g
                local_lr = lr * lr_bias
            return momentum * v + local_lr * d

        new_momentum = jax.tree_util.tree_map_with_path(
            new_v, updates, params, state.momentum
        )
        new_updates = jax.tree_util.tree_map(lambda v: -v, new_momentum)
        return new_updates, LarsState(momentum=new_momentum, count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)
