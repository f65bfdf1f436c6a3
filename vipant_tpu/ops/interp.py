"""Bilinear interpolation helpers matching torch ``F.interpolate(...,
mode="bilinear", align_corners=False)`` — the transform the reference uses
for every positional-embedding / conv-kernel retarget
(`/root/reference/cvap/module/encoder/audio_head.py:42-87`,
`/root/reference/cvap/module/val.py:524-556`). Used both at checkpoint-port
time (NumPy) and inside jitted forwards for siamese-shared grids (jnp).

``jax.image.resize(method="bilinear", antialias=False)`` implements exactly
the half-pixel sampling of align_corners=False.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """x: [..., H, W] → [..., out_h, out_w] (half-pixel, no antialias)."""
    out_shape = x.shape[:-2] + tuple(out_hw)
    return jax.image.resize(x, out_shape, method="bilinear", antialias=False)


def interp_pos_grid(
    pos: jnp.ndarray, old_hw: Tuple[int, int], new_hw: Tuple[int, int], n_prefix: int = 1
) -> jnp.ndarray:
    """Retarget a flattened grid positional embedding.

    pos: [n_prefix + old_h*old_w, D] → [n_prefix + new_h*new_w, D]; the
    leading ``n_prefix`` rows (class token) pass through unchanged.
    """
    if tuple(old_hw) == tuple(new_hw):
        return pos
    prefix, grid = pos[:n_prefix], pos[n_prefix:]
    d = grid.shape[-1]
    grid = grid.reshape(old_hw[0], old_hw[1], d).transpose(2, 0, 1)  # [D, H, W]
    grid = resize_bilinear(grid, new_hw)
    grid = grid.transpose(1, 2, 0).reshape(new_hw[0] * new_hw[1], d)
    return jnp.concatenate([prefix, grid], axis=0)


def slice_or_interp_pos_grid(
    pos: np.ndarray,
    old_hw: Tuple[int, int],
    new_hw: Tuple[int, int],
    n_prefix: int = 1,
    use_slice: bool = True,
    time_offset_rows: int = 6,
) -> np.ndarray:
    """Load-time retarget with the reference's slice-first policy
    (`/root/reference/cvap/module/encoder/audio_head.py:89-134`): when only
    the time axis shrinks and the freq axis matches, take a window of rows
    starting at ``time_offset_rows``; otherwise bilinear-interpolate."""
    pos = np.asarray(pos)
    if tuple(old_hw) == tuple(new_hw):
        return pos
    need = new_hw[0] * new_hw[1]
    if (
        use_slice
        and new_hw[1] == old_hw[1]
        and need + n_prefix <= pos.shape[0]
    ):
        extra = old_hw[0] - new_hw[0]
        if extra == 0:
            return pos[: need + n_prefix]
        start = time_offset_rows * old_hw[1] + n_prefix
        return np.concatenate([pos[:n_prefix], pos[start : start + need]], axis=0)
    return np.asarray(interp_pos_grid(jnp.asarray(pos), old_hw, new_hw, n_prefix))


def interp_conv_kernel_spatial(kernel: np.ndarray, new_hw: Tuple[int, int]) -> np.ndarray:
    """kernel: [kh, kw, in_ch, out_ch] (HWIO) → spatial resize to new_hw."""
    kernel = np.asarray(kernel)
    if kernel.shape[:2] == tuple(new_hw):
        return kernel
    k = jnp.transpose(jnp.asarray(kernel), (2, 3, 0, 1))  # [I, O, H, W]
    k = resize_bilinear(k, new_hw)
    return np.asarray(jnp.transpose(k, (2, 3, 0, 1)))
