"""Gather-free patch extraction (im2col) for ViT patchify on TPU.

An overlapping-stride patchify conv with 1 input channel (the audio tower's
log-mel input) maps terribly onto the MXU: the contraction dimension is the
channel count, so a direct conv runs at ~1/128 utilization. Extracting
patches with reshape/slice/stack (zero gathers — every patch starts on a
stride boundary) and contracting with one [ph·pw·C, width] matmul puts the
full patch size on the MXU's K dimension instead.

Same trick as the fbank framing (:mod:`vipant_tpu.ops.fbank`), applied per
axis.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _frame_axis(x: jnp.ndarray, axis: int, patch: int, stride: int) -> jnp.ndarray:
    """Insert a frames dimension at ``axis``: size n → (f, patch) where
    ``f = (n - patch) // stride + 1``. Pure reshape/slice/concat."""
    n = x.shape[axis]
    f = (n - patch) // stride + 1
    x = jnp.moveaxis(x, axis, 0)  # [n, ...rest]
    if stride == patch:  # non-overlapping fast path
        x = x[: f * patch].reshape(f, patch, *x.shape[1:])
    else:
        k = -(-patch // stride)  # chunks per frame
        need = (f - 1 + k) * stride
        if need > n:
            pad = [(0, need - n)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, pad)
        else:
            x = x[:need]
        chunks = x.reshape(-1, stride, *x.shape[1:])  # [f-1+k, stride, ...]
        views = [chunks[j : j + f] for j in range(k)]
        x = jnp.concatenate(views, axis=1)[:, :patch]  # [f, patch, ...]
    # [f, patch, ...rest] → frames at `axis`, patch right after
    return jnp.moveaxis(x, (0, 1), (axis, axis + 1))


def extract_patches(
    x: jnp.ndarray, patch_hw: Tuple[int, int], stride_hw: Tuple[int, int]
) -> jnp.ndarray:
    """x: [B, H, W, C] → [B, nrow·ncol, ph·pw·C], flattened in (h, w, c)
    order — matching a flattened HWIO conv kernel."""
    B, H, W, C = x.shape
    x = _frame_axis(x, 1, patch_hw[0], stride_hw[0])  # [B, nrow, ph, W, C]
    x = _frame_axis(x, 3, patch_hw[1], stride_hw[1])  # [B, nrow, ph, ncol, pw, C]
    nrow, ncol = x.shape[1], x.shape[3]
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # [B, nrow, ncol, ph, pw, C]
    return x.reshape(B, nrow * ncol, patch_hw[0] * patch_hw[1] * C)


def patchify_embed(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    patch_hw: Tuple[int, int],
    stride_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Fused patch-extract + embed: x [B, H, W, C] · kernel [ph, pw, C, D]
    → [B, nrow·ncol, D], contracting the (ph, pw, C) patch dims directly in
    ONE dot_general — no [B, nrow, ncol, ph, pw, C] transpose ever
    materializes in HBM (the relayout was the patchify cost, not the
    matmul; see docs/performance.md)."""
    B = x.shape[0]
    x = _frame_axis(x, 1, patch_hw[0], stride_hw[0])  # [B, nrow, ph, W, C]
    x = _frame_axis(x, 3, patch_hw[1], stride_hw[1])  # [B, nrow, ph, ncol, pw, C]
    nrow, ncol = x.shape[1], x.shape[3]
    out = jax.lax.dot_general(
        x,
        kernel,
        dimension_numbers=(((2, 4, 5), (0, 1, 2)), ((), ())),
        preferred_element_type=x.dtype,
    )  # [B, nrow, ncol, D]
    return out.reshape(B, nrow * ncol, kernel.shape[-1])
