"""On-device featurization: waveforms in the batch, fbank fused in-step."""

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.data import build_image_audio_dataloader
from vipant_tpu.ops import FbankParams, fbank_np
from vipant_tpu.ops.fbank import fbank_fixed_len
from vipant_tpu.train import build_monitor
from data_synth import make_synth_va_index

from test_trainers import TINY_MODEL


def test_dft_matmul_matches_golden(rng):
    wav = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    from vipant_tpu.ops import fbank

    ref = fbank_np(wav)
    out = np.asarray(fbank(wav, FbankParams(), use_dft=True))
    assert np.max(np.abs(out - ref)) < 5e-3


def test_waveform_loader_and_device_features(tmp_path):
    make_synth_va_index(str(tmp_path), "train", n=4, seconds=1.1)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        f"running.data_root={tmp_path}",
        "running.batch_size=4",
        "running.audio.on_device=True",
    ])
    loader = build_image_audio_dataloader(cfg, "train", train=False)
    batch = next(iter(loader))
    # eval items are fixed-length waveforms, not fbanks
    assert batch["audio"].shape == (4, int((100 / 100 + 0.05) * 16000))

    # device featurization of the eval batch matches the host golden
    feats = np.asarray(
        fbank_fixed_len(batch["audio"], FbankParams(), 100, norms=None)
    )
    ref = fbank_np(batch["audio"][0])[:100]
    assert np.max(np.abs(feats[0, : ref.shape[0]] - ref)) < 5e-3


def test_va_trainer_on_device_end_to_end(tmp_path):
    make_synth_va_index(str(tmp_path / "d"), "train", n=8, seconds=1.1)
    make_synth_va_index(str(tmp_path / "d"), "val", n=4, seconds=1.1)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/d",
        "running.data_name=train",
        "running.eval_name=val",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=4",
        "running.audio.on_device=True",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.on_device_audio
    mon.learn()
    report = mon.infer(mon.evalloader)
    assert "I->A" in report


@pytest.mark.parametrize("seconds", [1.1, 0.6])
def test_wav_int16_path_matches_f32(tmp_path, seconds):
    """int16 waveform shipping (half H2D): the dataset zero-means over the
    TRUE clip length on the host BEFORE padding/quantization (like the f32
    branch); the device rescales and removes only the sub-LSB quantization
    DC. seconds=0.6 pads the clip — without the host-side zero-mean the
    device's padded-length mean would mis-scale the DC correction and
    leave a nonzero pad tail (regression)."""
    make_synth_va_index(str(tmp_path), "train", n=4, seconds=seconds)
    base = [
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        f"running.data_root={tmp_path}",
        "running.batch_size=4",
        "running.audio.on_device=True",
    ]
    cfg16 = compose(base + ["running.audio.wav_int16=True"])
    cfg32 = compose(base)
    l16 = build_image_audio_dataloader(cfg16, "train", train=False)
    l32 = build_image_audio_dataloader(cfg32, "train", train=False)
    b16 = next(iter(l16))
    b32 = next(iter(l32))
    assert b16["audio"].dtype == np.int16
    assert b32["audio"].dtype == np.float32

    wav = b16["audio"].astype(np.float32) / 32767.0
    wav = wav - wav.mean(axis=-1, keepdims=True)  # device: sub-LSB DC only
    f_from16 = np.asarray(fbank_fixed_len(wav, FbankParams(), 100, norms=None))
    f_from32 = np.asarray(fbank_fixed_len(b32["audio"], FbankParams(), 100, norms=None))
    # int16 quantization noise only: measured directly (quantize a clean
    # zero-meaned tone+noise clip), the log-mel diff is mean ~9e-4 with a
    # max ~0.07 in near-floor frames where log() is steep — so the max
    # bound is loose and the mean bound carries the regression power
    d = np.abs(f_from16 - f_from32)
    assert d.max() < 0.2 and d.mean() < 5e-3


def test_va_trainer_int16_uint8_end_to_end(tmp_path):
    """One epoch through the low-transfer production pipeline
    (uint8 images + int16 waveforms + on-device fbank)."""
    make_synth_va_index(str(tmp_path / "d"), "train", n=8, seconds=1.1)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/d",
        "running.data_name=train",
        "running.eval_name=",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.audio.on_device=True",
        "running.audio.wav_int16=True",
        "running.image_uint8=True",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.epoch(0)
