"""Optimizer assembly from config: LARS or Adam(+schedule), gradient
clipping, and param freezing via masks.

Mirrors the capability of the reference's ``build_optimizer``
(`/root/reference/cvap/monitor/cvap.py:283-320`): the tunable-parameter set
comes from the model layer (freeze flags + excl_modules), the LARS path uses
batch-scaled cosine LR, and the torch.optim path becomes optax with a
warmup(+multistep) schedule. Freezing is optax-native: frozen leaves get
``set_to_zero`` updates (the multi_transform analogue of requires_grad=False,
SURVEY.md §7 hard-part 7).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .lars import lars, warmup_cosine_lr, warmup_multistep_lr


def build_optimizer(
    opt_cfg,
    steps_per_epoch: int,
    tunable_mask: Optional[Any] = None,
) -> Tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, lr_schedule). ``tunable_mask`` is a bool pytree (True =
    trainable); frozen leaves receive zero updates."""
    epochs = int(opt_cfg.epochs)
    total_steps = max(epochs * steps_per_epoch, 1)

    if bool(opt_cfg.get("use_lars", False)):
        base_lr = float(opt_cfg.batch_size) / 256.0
        warmup_steps = int(opt_cfg.get("warmup_epoch", 10)) * steps_per_epoch
        schedule = warmup_cosine_lr(base_lr, total_steps, warmup_steps)
        tx = lars(
            schedule,
            lr_weight=float(opt_cfg.get("lr_weight", 0.2)),
            lr_bias=float(opt_cfg.get("lr_bias", 0.0048)),
            eta=float(opt_cfg.get("eta", 0.001)),
            weight_decay=float(opt_cfg.get("weight_decay", 1e-6)),
        )
    else:
        lr = float(opt_cfg.lr)
        warmup_steps = int(opt_cfg.get("warmup_steps", 0)) if opt_cfg.get("warmup", False) else 0
        milestones = tuple(
            int(m) * steps_per_epoch for m in (opt_cfg.get("steps", []) or [])
        )
        schedule = warmup_multistep_lr(
            lr, max(warmup_steps, 1), milestones, float(opt_cfg.get("gamma", 0.5))
        )
        betas = opt_cfg.get("betas", [0.9, 0.999])
        tx = optax.chain(
            optax.scale_by_adam(b1=float(betas[0]), b2=float(betas[1])),
            optax.add_decayed_weights(float(opt_cfg.get("weight_decay", 0.0))),
            optax.scale_by_schedule(lambda step: -schedule(step)),
        )

    max_norm = opt_cfg.get("max_norm", None)
    if max_norm:
        tx = optax.chain(optax.clip_by_global_norm(float(max_norm)), tx)

    if tunable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", tunable_mask),
        )
    return tx, schedule
