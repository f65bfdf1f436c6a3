"""ctypes bindings for the C++ host audio frontend (libvipant_audio.so).

Build with ``make -C vipant_tpu/native`` (attempted automatically once).
Falls back to the NumPy implementations when the library is unavailable —
callers use :func:`native_available` or just call
:func:`vipant_tpu.data.transforms_audio.host_fbank`, which dispatches.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ..ops.fbank_np import FbankParams

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libvipant_audio.so")
_LIB = None
_TRIED = False

_WINDOW_CODES = {"hanning": 0, "hamming": 1, "povey": 2, "rectangular": 3}


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:  # one silent build attempt
            subprocess.run(
                ["make", "-C", _DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.vt_wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vt_wav_info.restype = ctypes.c_int
    lib.vt_wav_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.vt_wav_read.restype = ctypes.c_int
    lib.vt_fbank.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.vt_fbank.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def read_wav_native(path: str) -> Tuple[np.ndarray, int]:
    """Returns ([channels, samples] float32 ±1, sample_rate)."""
    lib = _load()
    assert lib is not None, "native library not built"
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.vt_wav_info(path.encode(), ctypes.byref(n), ctypes.byref(sr), ctypes.byref(ch))
    if rc != 0:
        raise ValueError(f"vt_wav_info({path}) -> {rc}")
    out = np.empty((ch.value, n.value), np.float32)
    frames = lib.vt_wav_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n.value
    )
    if frames < 0:
        raise ValueError(f"vt_wav_read({path}) -> {frames}")
    return out[:, :frames], sr.value


def fbank_native(waveform: np.ndarray, params: FbankParams) -> np.ndarray:
    """[n] float32 waveform → [frames, num_mel_bins] float32 log-mel."""
    lib = _load()
    assert lib is not None, "native library not built"
    wav = np.ascontiguousarray(np.asarray(waveform, np.float32).reshape(-1))
    max_frames = params.num_frames(wav.shape[0])
    out = np.empty((max(max_frames, 1), params.num_mel_bins), np.float32)
    m = lib.vt_fbank(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wav.shape[0],
        int(params.sample_rate),
        int(params.num_mel_bins),
        float(params.frame_length_ms),
        float(params.frame_shift_ms),
        _WINDOW_CODES.get(params.window_type, 0),
        float(params.preemphasis),
        int(params.remove_dc_offset),
        float(params.low_freq),
        float(params.high_freq),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames,
    )
    if m < 0:
        raise RuntimeError(f"vt_fbank -> {m}")
    return out[:m]
