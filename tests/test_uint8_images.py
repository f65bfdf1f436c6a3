"""uint8 image path: 4× smaller H2D, normalization on device."""

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.data import build_image_audio_dataloader
from vipant_tpu.data.transforms_image import (
    CLIP_MEAN,
    CLIP_STD,
    clip_preprocess,
    clip_preprocess_uint8,
    device_normalize_image,
)
from vipant_tpu.train import build_monitor
from data_synth import make_synth_va_index

from test_trainers import TINY_MODEL


def test_uint8_preprocess_matches_float(tmp_path, rng):
    from PIL import Image

    img = Image.fromarray((rng.random((96, 80, 3)) * 255).astype(np.uint8))
    ref = clip_preprocess(img, 64)
    u8 = clip_preprocess_uint8(img, 64)
    assert u8.dtype == np.uint8 and u8.shape == (3, 64, 64)
    normalized = np.asarray(device_normalize_image(u8[None]))[0]
    assert np.max(np.abs(normalized - ref)) < 1e-5


def test_uint8_batches_and_training(tmp_path):
    make_synth_va_index(str(tmp_path / "d"), "train", n=4, seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/d",
        "running.data_name=train",
        "running.eval_name=train",
        "running.image_uint8=True",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=4",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    loader = build_image_audio_dataloader(cfg, "train", train=False)
    batch = next(iter(loader))
    assert batch["image"].dtype == np.uint8

    mon = build_monitor(cfg)
    assert mon.image_uint8 and mon.needs_device_frontend
    mon.learn()
    report = mon.infer(mon.evalloader)
    assert "I->A" in report
