"""On-device log-mel fbank: batched, jittable, XLA/TPU-native.

Numerics match :mod:`vipant_tpu.ops.fbank_np` (and therefore
``torchaudio.compliance.kaldi.fbank`` as used by the reference at
`/root/reference/cvap/data/audio/transform.py:29-33`). The hot path is
MXU/VPU-friendly: framing via ``conv_general_dilated_patches``, window +
preemphasis as fused elementwise ops, real FFT through XLA's native FFT, and
the mel filterbank applied as one [B·F, 257]×[257, M] matmul.

All shapes are static under jit; the number of frames is a function of the
(static) sample count.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fbank_np import FbankParams, _EPSILON
from .mel import feature_window, mel_banks


@functools.lru_cache(maxsize=8)
def _window_const(window_size: int, window_type: str) -> np.ndarray:
    return feature_window(window_size, window_type).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _banks_const(
    num_bins: int, padded: int, rate: int, low: float, high: float
) -> np.ndarray:
    return mel_banks(num_bins, padded, rate, low, high).T.copy()  # [nfft+1, bins]


@functools.lru_cache(maxsize=8)
def _dft_mel_const(
    num_bins: int, padded: int, rate: int, low: float, high: float
) -> tuple:
    """Real/imag DFT matrices pre-multiplied is not possible (power is
    nonlinear), so return ([padded, nfft+1] cos, sin) for the spectrum
    matmuls. On TPU these two GEMMs run on the MXU and fuse with the mel
    matmul — XLA's FFT op does not."""
    nfft = padded // 2
    n = np.arange(padded)[:, None]
    k = np.arange(nfft + 1)[None, :]
    ang = -2.0 * np.pi * n * k / padded
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("params", "use_dft"))
def fbank(
    waveforms: jnp.ndarray,
    params: FbankParams = FbankParams(),
    use_dft: Optional[bool] = None,
) -> jnp.ndarray:
    """[B, num_samples] (or [num_samples]) → [B, num_frames, num_mel_bins].

    float32 in, float32 out; run under ``jax.default_matmul_precision`` or
    cast downstream for bf16 training.
    """
    squeeze = waveforms.ndim == 1
    if squeeze:
        waveforms = waveforms[None]
    B, T = waveforms.shape
    size, shift = params.window_size, params.window_shift
    num_frames = params.num_frames(T)
    if num_frames <= 0:
        raise ValueError(f"waveform too short: {T} < window {size}")

    x = waveforms.astype(jnp.float32)
    # Framing without gathers: every frame starts on a `shift` boundary, so
    # reshape into shift-sized chunks and stack k shifted views — pure
    # reshape/slice/concat, which XLA compiles to views (no data movement
    # beyond one concat), unlike a [F, size] gather or an identity conv.
    k = -(-size // shift)  # chunks per frame (ceil)
    padded_len = (num_frames - 1 + k) * shift
    if padded_len > T:
        x = jnp.pad(x, ((0, 0), (0, padded_len - T)))
    else:
        x = x[:, :padded_len]
    chunks = x.reshape(B, -1, shift)  # [B, num_frames-1+k, shift]
    views = [chunks[:, j : j + num_frames] for j in range(k)]
    frames = jnp.concatenate(views, axis=2)[:, :, :size]  # [B, F, size]

    if params.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if params.preemphasis != 0.0:
        shifted = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - params.preemphasis * shifted
    frames = frames * jnp.asarray(_window_const(size, params.window_type))

    padded = params.padded_window_size
    if use_dft is None:  # TPU: DFT-as-matmul rides the MXU; XLA FFT does not
        use_dft = jax.default_backend() not in ("cpu",)
    if use_dft:
        cos_m, sin_m = _dft_mel_const(
            params.num_mel_bins, padded, params.sample_rate,
            params.low_freq, params.high_freq,
        )
        # frames [B, F, size] (unpadded — the DFT matrices' zero rows beyond
        # `size` never contribute, so slice them away)
        re = jax.lax.dot_general(
            frames, jnp.asarray(cos_m[: frames.shape[-1]]),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        im = jax.lax.dot_general(
            frames, jnp.asarray(sin_m[: frames.shape[-1]]),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        power = re ** 2 + im ** 2  # [B, F, padded//2+1]
    else:
        if padded != size:
            frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - size)))
        spec = jnp.fft.rfft(frames, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # [B, F, padded//2+1]

    banks = jnp.asarray(
        _banks_const(
            params.num_mel_bins,
            padded,
            params.sample_rate,
            params.low_freq,
            params.high_freq,
        )
    )
    mel = jax.lax.dot_general(
        power,
        banks,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = jnp.log(jnp.maximum(mel, _EPSILON))
    return out[0] if squeeze else out


def fbank_fixed_len(
    waveforms: jnp.ndarray,
    params: FbankParams,
    max_frames: int,
    norms: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """fbank + truncate/zero-pad to ``max_frames`` + optional (mean, std)
    normalization — the full per-clip frontend of the reference data loader
    (`/root/reference/cvap/data/audio/transform.py:12-35` + dataset-side pad
    and normalize)."""
    feats = fbank(waveforms, params)
    if feats.ndim == 2:
        feats = feats[None]
    B, F, M = feats.shape
    if F >= max_frames:
        feats = feats[:, :max_frames]
    else:
        feats = jnp.pad(feats, ((0, 0), (0, max_frames - F), (0, 0)))
    if norms is not None:
        mean, std = norms
        feats = (feats - mean) / std
    return feats
