import numpy as np
import pytest

from vipant_tpu.ops import FbankParams, fbank, fbank_fixed_len, fbank_np
from vipant_tpu.ops.mel import mel_banks, next_power_of_two


def _tone(seconds=1.0, sr=16000, freq=440.0, rng=None):
    t = np.arange(int(seconds * sr)) / sr
    wav = 0.5 * np.sin(2 * np.pi * freq * t)
    if rng is not None:
        wav = wav + 0.01 * rng.standard_normal(wav.shape)
    return wav.astype(np.float32)


def test_next_power_of_two():
    assert next_power_of_two(400) == 512
    assert next_power_of_two(512) == 512
    assert next_power_of_two(1) == 1


def test_mel_banks_shape_and_partition():
    banks = mel_banks(128, 512, 16000)
    assert banks.shape == (128, 257)
    assert banks[:, -1].sum() == 0.0  # nyquist bin unused
    assert (banks >= 0).all()
    # interior FFT bins inside [low, high] are covered by some filter
    assert (banks.sum(0)[2:-5] > 0).all()


def test_num_frames():
    p = FbankParams()
    assert p.window_size == 400 and p.window_shift == 160
    assert p.num_frames(160800) == 1003  # 10.05 s crop in the reference
    assert p.num_frames(16000) == 98


def test_jax_matches_numpy(rng):
    wav = _tone(seconds=1.0, rng=rng)
    ref = fbank_np(wav)
    out = np.asarray(fbank(wav))
    assert out.shape == ref.shape == (98, 128)
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


def test_jax_batched(rng):
    wavs = np.stack([_tone(rng=rng), _tone(freq=880.0, rng=rng)])
    out = np.asarray(fbank(wavs))
    assert out.shape == (2, 98, 128)
    for i in range(2):
        ref = fbank_np(wavs[i])
        assert np.max(np.abs(out[i] - ref)) < 2e-3


def test_tone_peaks_at_expected_mel_bin(rng):
    """440 Hz tone must peak in a low mel bin; 4 kHz in a high one."""
    low = np.asarray(fbank(_tone(freq=440.0))).mean(0).argmax()
    high = np.asarray(fbank(_tone(freq=4000.0))).mean(0).argmax()
    assert low < high
    assert 10 < low < 60
    assert high > 80


def test_fixed_len_pad_truncate_normalize(rng):
    wav = _tone(seconds=1.0, rng=rng)
    out = np.asarray(fbank_fixed_len(wav[None], FbankParams(), 1000))
    assert out.shape == (1, 1000, 128)
    assert np.all(out[0, 98:] == 0.0)  # zero-padded tail
    out2 = np.asarray(
        fbank_fixed_len(wav[None], FbankParams(), 50, norms=(-4.9384, 5.7575))
    )
    assert out2.shape == (1, 50, 128)
    ref = (fbank_np(wav)[:50] + 4.9384) / 5.7575
    assert np.max(np.abs(out2[0] - ref)) < 2e-3


@pytest.mark.parametrize("nbins,sr", [(64, 16000), (128, 44100)])
def test_other_configs_consistent(rng, nbins, sr):
    p = FbankParams(sample_rate=sr, num_mel_bins=nbins)
    wav = (0.3 * rng.standard_normal(sr // 2)).astype(np.float32)
    ref = fbank_np(wav, p)
    out = np.asarray(fbank(wav, p))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3
