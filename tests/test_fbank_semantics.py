"""Property tests pinning the documented Kaldi fbank semantics as
individually-asserted behaviors (not only whole-pipeline diffs), so a future
torchaudio check has a precise surface to validate against
(`torchaudio.compliance.kaldi.fbank`; consumed by the reference at
`/root/reference/cvap/data/audio/transform.py:29-33`)."""

import numpy as np
import pytest

from vipant_tpu.ops.fbank_np import FbankParams, fbank, frame_signal
from vipant_tpu.ops.mel import feature_window, mel_banks, mel_scale, next_power_of_two


def test_snip_edges_frame_count():
    """snip_edges: m = 1 + (n - window) // shift; zero when n < window."""
    p = FbankParams()
    assert p.window_size == 400 and p.window_shift == 160
    assert p.num_frames(399) == 0
    assert p.num_frames(400) == 1
    assert p.num_frames(559) == 1
    assert p.num_frames(560) == 2
    assert p.num_frames(16000) == 1 + (16000 - 400) // 160  # 98
    # frames index the waveform at k*shift .. k*shift+window
    wav = np.arange(1000, dtype=np.float32)
    fr = frame_signal(wav, p)
    assert fr.shape == (1 + (1000 - 400) // 160, 400)
    np.testing.assert_array_equal(fr[1], wav[160:560])


def test_padded_window_is_next_power_of_two():
    assert next_power_of_two(400) == 512
    assert next_power_of_two(512) == 512
    assert next_power_of_two(513) == 1024
    assert next_power_of_two(1) == 1


def test_preemphasis_replicates_first_sample():
    """Kaldi pre-emphasis: y[0] = x[0] - c*x[0] (replicate pad), y[i] =
    x[i] - c*x[i-1]."""
    p = FbankParams(remove_dc_offset=False, preemphasis=0.97)
    wav = np.random.default_rng(0).standard_normal(400).astype(np.float32)
    fr = frame_signal(wav, p)[0]
    want0 = fr[0] - 0.97 * fr[0]
    want5 = fr[5] - 0.97 * fr[4]
    # reproduce the pipeline stage directly
    shifted = np.concatenate([fr[:1], fr[:-1]])
    got = fr - 0.97 * shifted
    assert got[0] == pytest.approx(want0)
    assert got[5] == pytest.approx(want5)


def test_remove_dc_offset_is_per_frame_mean():
    p = FbankParams()
    wav = (np.random.default_rng(1).standard_normal(880) + 3.0).astype(np.float32)
    fr = frame_signal(wav, p)
    centered = fr - fr.mean(axis=1, keepdims=True)
    assert np.abs(centered.mean(axis=1)).max() < 1e-6


def test_hanning_window_values():
    """Kaldi 'hanning': 0.5 - 0.5*cos(2*pi*i/(N-1)) — zero at both ends."""
    w = feature_window(400, "hanning")
    i = np.arange(400)
    want = 0.5 - 0.5 * np.cos(2 * np.pi * i / 399.0)
    np.testing.assert_allclose(w, want, rtol=1e-6, atol=1e-7)
    assert w[0] == pytest.approx(0.0) and w[-1] == pytest.approx(0.0, abs=1e-6)


def test_povey_window_is_hanning_pow_085():
    w = feature_window(400, "povey")
    h = feature_window(400, "hanning")
    np.testing.assert_allclose(w, h ** 0.85, rtol=1e-6, atol=1e-7)


def test_mel_scale_formula():
    np.testing.assert_allclose(mel_scale(700.0), 1127.0 * np.log(2.0), rtol=1e-12)
    assert mel_scale(0.0) == 0.0


def test_mel_breakpoints_uniform_on_mel_axis():
    """Filter centers sit at low + (j+1)*delta on the mel axis with
    delta = (mel(high)-mel(low))/(bins+1); triangles peak at 1."""
    bins, padded, sr = 8, 512, 16000
    banks = mel_banks(bins, padded, sr, low_freq=20.0, high_freq=0.0)
    assert banks.shape == (bins, padded // 2 + 1)
    assert banks[:, -1].max() == 0.0  # Nyquist bin unweighted
    mel_low, mel_high = mel_scale(20.0), mel_scale(sr / 2)
    delta = (mel_high - mel_low) / (bins + 1)
    fft_hz = (sr / padded) * np.arange(padded // 2)
    fft_mel = mel_scale(fft_hz)
    for j in range(bins):
        left, center, right = (mel_low + (j + k) * delta for k in (0, 1, 2))
        support = np.where(banks[j, : padded // 2] > 0)[0]
        assert fft_mel[support].min() > left - delta * 1e-6
        assert fft_mel[support].max() < right + delta * 1e-6
        # peak weight approaches 1 near the center
        k = int(np.argmin(np.abs(fft_mel - center)))
        assert banks[j, k] > 0.8

    # triangles partition (sum to ~1) strictly inside (low, high)
    inside = (fft_mel > mel_low + delta) & (fft_mel < mel_high - delta)
    np.testing.assert_allclose(banks[:, : padded // 2].sum(0)[inside], 1.0, atol=1e-4)


def test_log_floor_is_float32_eps():
    """Silence maps to log(eps_f32), not -inf."""
    p = FbankParams(dither=0.0)
    feats = fbank(np.zeros(800, np.float32), p)
    want = np.log(np.finfo(np.float32).eps)
    np.testing.assert_allclose(feats, want, rtol=1e-6)


def test_htk_compat_is_noop_without_energy():
    """htk_compat only reorders/offsets the energy coefficient; with
    use_energy=False (the reference's setting) outputs are identical."""
    wav = np.random.default_rng(2).standard_normal(1600).astype(np.float32)
    a = fbank(wav, FbankParams(htk_compat=True))
    b = fbank(wav, FbankParams(htk_compat=False))
    np.testing.assert_array_equal(a, b)


def test_parseval_energy_sanity():
    """A pure tone at a filter center concentrates its energy in the
    adjacent mel bins (spectral leakage aside)."""
    p = FbankParams(num_mel_bins=40)
    sr = p.sample_rate
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    feats = fbank(tone, p)
    banks = mel_banks(40, p.padded_window_size, sr)
    # which mel bin covers 1 kHz?
    hz = (sr / p.padded_window_size) * np.arange(p.padded_window_size // 2 + 1)
    k = int(np.argmin(np.abs(hz - 1000.0)))
    j = int(np.argmax(banks[:, k]))
    assert feats.mean(0).argmax() in (j - 1, j, j + 1)
