"""Train state: params + optimizer + step (+ mutable collections + rng).

Unlike the reference — whose checkpoints stored model weights only, making
"resume" really "re-init" (`/root/reference/cvap/monitor/cvap.py:274-281`,
SURVEY.md §5) — the state here carries optimizer state and step so training
resumes exactly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """``params`` holds the TRAINABLE subtree; ``frozen_params`` the rest
    (kept as a state field — not a jit closure constant — so frozen towers
    travel as device-resident arguments instead of HLO literals)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    frozen_params: Any = None
    batch_stats: Any = None
    rng: Any = None

    @classmethod
    def create(
        cls,
        params,
        tx: optax.GradientTransformation,
        frozen_params=None,
        batch_stats=None,
        rng=None,
    ):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            frozen_params=frozen_params,
            batch_stats=batch_stats,
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        )

    def full_params(self):
        from ..optim.partition import merge_params

        if self.frozen_params is None:
            return self.params
        return merge_params(self.params, self.frozen_params)

    def apply_gradients(self, tx: optax.GradientTransformation, grads, **changes):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **changes,
        )
