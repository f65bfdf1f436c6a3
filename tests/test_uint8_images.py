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


def test_int16_fbank_shipping(tmp_path):
    """ship_int16: the npz dataset quantizes normalized fbanks to int16
    (half the H2D bytes) and the device frontend dequantizes to within the
    quantization step of the f32 path."""
    import jax.numpy as jnp

    from data_synth import make_synth_va_npz_index
    from vipant_tpu.config import compose
    from vipant_tpu.data import build_image_audio_dataloader
    from vipant_tpu.data.image_audio import FBANK_INT16_SCALE

    make_synth_va_npz_index(str(tmp_path), "npz_train", n=4, frames=120)
    base = [
        "+running=bimodal", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=transformer_val", "+running/audio=default",
        f"running.data_root={tmp_path}", "running.batch_size=4",
        "running.audio.max_len=100",
        "running.audio.norms=[-4.9384, 5.7575]",
        "running.audio.transform_fbank=False",
        "num_proc=2",
    ]
    cfg32 = compose(base)
    cfg16 = compose(base + ["running.audio.ship_int16=True"])
    b32 = next(iter(build_image_audio_dataloader(cfg32, "npz_train", False)))
    b16 = next(iter(build_image_audio_dataloader(cfg16, "npz_train", False)))
    assert b16["audio"].dtype == np.int16
    assert b16["audio"].shape == b32["audio"].shape == (4, 1, 100, 128)
    deq = np.asarray(b16["audio"], np.float32) / FBANK_INT16_SCALE
    np.testing.assert_allclose(deq, b32["audio"], atol=0.5 / FBANK_INT16_SCALE + 1e-6)

    # trainer frontend routes the int16 batch through dequantization
    from vipant_tpu.train import build_monitor

    cfg = compose(base + [
        "+model/loss=ce", "+optimizer=standard",
        "model.image.width=64", "model.image.embed_dim=32",
        "model.image.encoder.layers=2", "model.image.heads=4",
        "model.text.name=DummyHead",
        "running.audio.ship_int16=True",
        "model.audio.pre_encoder.stride=[16,24]",
        "optimizer.use_lars=False", "optimizer.warmup=False",
        "verbose=False", "mesh.data=1", "worker=CVAP", "monitor=VAMonitor",
        "running.data_name=npz_train", "running.eval_name=",
        "running.epochs=1", "running.peep_rate=1",
        "running.save_rate=1000000", "running.save_epoch=False",
        f"alias_root={tmp_path}/run", f"model_root={tmp_path}/run",
        "model_file=", "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.audio_int16_fbank and mon.needs_device_frontend
    args = mon.device_frontend((None, jnp.asarray(b16["audio"])), None, train=False)
    np.testing.assert_allclose(np.asarray(args[1]), deq, atol=1e-6)
    mon.epoch(0)
    assert mon.global_step == 1


def test_bf16_fbank_shipping(tmp_path):
    """ship_bf16: the npz dataset ships normalized fbanks as bfloat16 (half
    the H2D bytes; exact round-to-nearest-even of the f32 path) and the
    device frontend upcasts to f32."""
    import jax.numpy as jnp
    import ml_dtypes

    from data_synth import make_synth_va_npz_index
    from vipant_tpu.config import compose
    from vipant_tpu.data import build_image_audio_dataloader

    make_synth_va_npz_index(str(tmp_path), "npz_train", n=4, frames=120)
    base = [
        "+running=bimodal", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=transformer_val", "+running/audio=default",
        f"running.data_root={tmp_path}", "running.batch_size=4",
        "running.audio.max_len=100",
        "running.audio.norms=[-4.9384, 5.7575]",
        "running.audio.transform_fbank=False",
        "num_proc=2",
    ]
    cfg32 = compose(base)
    cfgb = compose(base + ["running.audio.ship_bf16=True"])
    b32 = next(iter(build_image_audio_dataloader(cfg32, "npz_train", False)))
    bb = next(iter(build_image_audio_dataloader(cfgb, "npz_train", False)))
    assert bb["audio"].dtype == np.dtype(ml_dtypes.bfloat16)
    assert bb["audio"].shape == b32["audio"].shape == (4, 1, 100, 128)
    # bf16 RNE of the f32 values, exactly (numpy cast == device semantics)
    np.testing.assert_array_equal(
        np.asarray(bb["audio"]),
        np.asarray(b32["audio"]).astype(ml_dtypes.bfloat16),
    )

    # trainer frontend upcasts the bf16 batch to f32 and the step runs
    from vipant_tpu.train import build_monitor

    cfg = compose(base + [
        "+model/loss=ce", "+optimizer=standard",
        "model.image.width=64", "model.image.embed_dim=32",
        "model.image.encoder.layers=2", "model.image.heads=4",
        "model.text.name=DummyHead",
        "running.audio.ship_bf16=True",
        "model.audio.pre_encoder.stride=[16,24]",
        "optimizer.use_lars=False", "optimizer.warmup=False",
        "verbose=False", "mesh.data=1", "worker=CVAP", "monitor=VAMonitor",
        "running.data_name=npz_train", "running.eval_name=",
        "running.epochs=1", "running.peep_rate=1",
        "running.save_rate=1000000", "running.save_epoch=False",
        f"alias_root={tmp_path}/run", f"model_root={tmp_path}/run",
        "model_file=", "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.audio_bf16_fbank and mon.needs_device_frontend
    args = mon.device_frontend((None, jnp.asarray(np.asarray(bb["audio"]))), None, train=False)
    assert args[1].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(args[1]),
        np.asarray(bb["audio"]).astype(np.float32),
        atol=0,
    )
    mon.epoch(0)
    assert mon.global_step == 1


def test_image_transforms_return_contiguous():
    """Items must be C-contiguous: np.stack over CHW transpose *views* pays
    an ~80x strided-copy penalty in the single collate thread (137 ms vs
    1.7 ms per 64-image uint8 batch on the 1-CPU bench host), while making
    each item contiguous costs ~0.1 ms in the parallel item workers."""
    from PIL import Image

    from vipant_tpu.data.transforms_image import (
        SharedImageTransform,
        TrainImageTransform,
        clip_preprocess,
        clip_preprocess_uint8,
    )

    img = Image.fromarray(
        (np.random.rand(240, 320, 3) * 255).astype(np.uint8)
    )
    for arr in (
        clip_preprocess(img),
        clip_preprocess_uint8(img),
        TrainImageTransform()(img),
        *SharedImageTransform()(img, both=True, train=True),
    ):
        assert arr.flags["C_CONTIGUOUS"], arr.shape
