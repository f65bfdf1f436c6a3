"""LARS update semantics vs a clean-room NumPy transcription of the
reference algorithm (`/root/reference/cvap/module/lars.py:24-72`): trust
ratio q = η·‖p‖/‖g + λp‖ and weight decay on >1-dim params only, heavyweight
momentum v ← m·v + lr_local·d, p ← p − v, with separate weight/bias LRs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.optim.lars import lars


def reference_lars_step(p, g, v, lr, lr_weight, lr_bias, momentum, eta, wd):
    """One step of the reference's update rule, NumPy."""
    if p.ndim > 1:  # weight: decay + trust-ratio adaptation
        d = g + wd * p
        p_norm = np.linalg.norm(p)
        d_norm = np.linalg.norm(d)
        q = eta * p_norm / d_norm if (p_norm > 0 and d_norm > 0) else 1.0
        local_lr = lr * lr_weight * q
    else:  # bias/gain: no decay, no adaptation
        d = g
        local_lr = lr * lr_bias
    v_new = momentum * v + local_lr * d
    return p - v_new, v_new


@pytest.mark.parametrize("steps", [1, 3])
def test_lars_matches_reference_semantics(rng, steps):
    lr0 = 0.7
    kw = dict(lr_weight=0.2, lr_bias=0.0048, momentum=0.9, eta=0.001, weight_decay=1e-6)
    params = {
        "w": rng.standard_normal((8, 4)).astype(np.float32),
        "b": rng.standard_normal((4,)).astype(np.float32),
    }
    grads = [
        {
            "w": rng.standard_normal((8, 4)).astype(np.float32),
            "b": rng.standard_normal((4,)).astype(np.float32),
        }
        for _ in range(steps)
    ]

    # ours
    tx = lars(lambda step: jnp.asarray(lr0), **kw)
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    state = tx.init(jp)
    for g in grads:
        updates, state = tx.update({k: jnp.asarray(v) for k, v in g.items()}, state, jp)
        jp = {k: jp[k] + updates[k] for k in jp}

    # reference transcription
    npp = {k: v.copy() for k, v in params.items()}
    vel = {k: np.zeros_like(v) for k, v in params.items()}
    for g in grads:
        for k in npp:
            npp[k], vel[k] = reference_lars_step(
                npp[k], g[k], vel[k], lr0, kw["lr_weight"], kw["lr_bias"],
                kw["momentum"], kw["eta"], kw["weight_decay"],
            )

    for k in npp:
        np.testing.assert_allclose(np.asarray(jp[k]), npp[k], rtol=1e-5, atol=1e-6)
