"""SpecAugment masking as vectorized on-device ops with JAX PRNG keys.

Capability parity with torchaudio's ``FrequencyMasking``/``TimeMasking`` as
configured by the reference (`FrequencyMasking(32)`, `TimeMasking(200)`;
`/root/reference/configs/running/audio/default.yaml:17-20`): per example,
a mask width is drawn uniformly from [0, param) and a start position from
[0, axis_len - width), and the band is filled with ``mask_value``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_mask(key: jax.Array, batch: int, axis_len: int, mask_param: int) -> jnp.ndarray:
    """[B, axis_len] bool — True where masked."""
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1, (batch, 1), minval=0.0, maxval=float(mask_param))
    start = jax.random.uniform(k2, (batch, 1)) * (axis_len - width)
    pos = jnp.arange(axis_len, dtype=jnp.float32)[None, :]
    return (pos >= start) & (pos < start + width)


def freq_mask(
    key: jax.Array, feats: jnp.ndarray, mask_param: int, mask_value: float = 0.0
) -> jnp.ndarray:
    """feats: [B, T, M]; masks a random mel band per example."""
    m = _axis_mask(key, feats.shape[0], feats.shape[2], mask_param)
    return jnp.where(m[:, None, :], jnp.asarray(mask_value, feats.dtype), feats)


def time_mask(
    key: jax.Array, feats: jnp.ndarray, mask_param: int, mask_value: float = 0.0
) -> jnp.ndarray:
    """feats: [B, T, M]; masks a random time band per example."""
    m = _axis_mask(key, feats.shape[0], feats.shape[1], mask_param)
    return jnp.where(m[:, :, None], jnp.asarray(mask_value, feats.dtype), feats)


def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,
    freq_param: int = 32,
    time_param: int = 200,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    kf, kt = jax.random.split(key)
    feats = freq_mask(kf, feats, freq_param, mask_value)
    return time_mask(kt, feats, time_param, mask_value)
