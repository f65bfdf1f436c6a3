"""Int8 quantization helpers for the serving path.

v5e's MXU runs int8×int8→int32 at ~2× the bf16 rate; measured on this chip
(`experiments/int8_probe.py`) the raw dot delivers 1.62× at large sizes and
the fused int8 MLP kernel 1.26× over the bf16 fused kernel at B=256
(docs/performance.md). The scheme is standard post-training dynamic
quantization: weights per-output-channel symmetric int8 (quantized once
per jitted call — ~0.2 ms for all 12 layers, amortized over a serving
batch), activations per-token (per-row) dynamic symmetric int8 computed
in-kernel where the tensors are already VMEM-resident.

Forward-only by design: training stays bf16 (no reference counterpart —
the reference serves fp16 CUDA, `/root/reference/clip/model.py:372-393`).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

# Trace-time switch for the fwd-only int8 kernels, scoped to one module's
# subtree (unlike the process-global VIPANT_INT8_* env vars): a FROZEN tower
# inside a training step is legitimately forward-only — its output is a
# constant w.r.t. the differentiated params, so AD never needs a VJP through
# it — and can run the int8 kernels while the trainable towers stay bf16
# (`model.image.int8_frozen`, nn/heads.py).
_INT8_FWD = contextvars.ContextVar("vipant_int8_fwd", default=False)


@contextlib.contextmanager
def int8_fwd_context(enabled: bool = True):
    token = _INT8_FWD.set(bool(enabled))
    try:
        yield
    finally:
        _INT8_FWD.reset(token)


def int8_fwd_enabled() -> bool:
    return _INT8_FWD.get()


def quantize_cols(w: jnp.ndarray):
    """Per-output-column symmetric int8: w [K, M] → (w_i8 [K, M],
    scale [1, M] fp32) with w ≈ w_i8 * scale."""
    w32 = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0 + 1e-12
    wi = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return wi, scale


def quantize_rows(x: jnp.ndarray):
    """Per-row (per-token) symmetric int8: x [..., K] → (x_i8, scale
    [..., 1] fp32) with x ≈ x_i8 * scale. Works inside Pallas kernels
    (VPU abs-max reduce + round/clip) and in plain XLA."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0 + 1e-12
    xi = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return xi, scale
