"""C++ native frontend vs the NumPy golden."""

import numpy as np
import pytest

from vipant_tpu.data.wav import read_wav, write_wav
from vipant_tpu.native import fbank_native, native_available, read_wav_native
from vipant_tpu.ops import FbankParams, fbank_np

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libvipant_audio.so not built"
)


def test_native_wav_matches_numpy(tmp_path, rng):
    wav = (0.5 * rng.standard_normal((2, 8000))).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, 16000)
    ref, sr_ref = read_wav(path)
    out, sr = read_wav_native(path)
    assert sr == sr_ref == 16000
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_fbank_matches_golden(rng):
    t = np.arange(16000) / 16000.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.standard_normal(16000)).astype(
        np.float32
    )
    p = FbankParams()
    ref = fbank_np(wav, p)
    out = fbank_native(wav, p)
    assert out.shape == ref.shape == (98, 128)
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


@pytest.mark.parametrize("window", ["hanning", "povey", "hamming"])
def test_native_fbank_windows(rng, window):
    wav = (0.3 * rng.standard_normal(8000)).astype(np.float32)
    p = FbankParams(window_type=window, num_mel_bins=64)
    ref = fbank_np(wav, p)
    out = fbank_native(wav, p)
    assert np.max(np.abs(out - ref)) < 2e-3


def test_native_speed(rng):
    """The native path should beat NumPy comfortably on a 10 s clip."""
    import time

    wav = (0.3 * rng.standard_normal(160800)).astype(np.float32)
    p = FbankParams()
    fbank_native(wav, p)  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        fbank_native(wav, p)
    t_native = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        fbank_np(wav, p)
    t_np = (time.perf_counter() - t0) / 5
    # informative, not strict: native should not be slower than 2x numpy
    assert t_native < t_np * 2.0, (t_native, t_np)
