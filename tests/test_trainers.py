"""End-to-end trainer smoke tests on synthetic data (tiny shapes, CPU mesh)."""

import os

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.train import MONITORS, build_monitor
from data_synth import make_synth_clotho, make_synth_esc50, make_synth_va_index

TINY_MODEL = [
    "+model/image=vit_val",
    "+model/audio=vit_val",
    "+model/text=transformer_val",
    "+optimizer=standard",
    "+running/audio=default",
    "model.image.width=64",
    "model.image.embed_dim=32",
    "model.image.encoder.layers=2",
    "model.image.heads=4",
    "model.text.width=32",
    "model.text.heads=4",
    "model.text.encoder.layers=2",
    "running.audio.max_len=100",
    "model.audio.pre_encoder.stride=[16,24]",
    "optimizer.use_lars=False",
    "optimizer.warmup=False",
    "verbose=False",
    "num_proc=2",
    "mesh.data=2",  # tiny test batches must divide the data axis
]


def test_monitor_registry_complete():
    for name in ("VAMonitor", "LAMonitor", "VALMonitor", "VASMonitor", "ASMonitor", "ESCMonitor"):
        assert name in MONITORS, name


def test_va_trainer_end_to_end(tmp_path):
    make_synth_va_index(str(tmp_path / "data"), "train", n=8, seconds=1.05)
    make_synth_va_index(str(tmp_path / "data"), "val", n=4, seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/data",
        "running.data_name=train",
        "running.eval_name=val",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=True",
        "running.eval_samples=4",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()
    # a checkpoint was written and carries optimizer state
    ckpts = [d for d in os.listdir(f"{tmp_path}/run/test") if d.isdigit()]
    assert ckpts, "no checkpoint saved"
    # eval-only pass from the saved state
    report = mon.infer(mon.evalloader)
    assert "I->A" in report and "A->I" in report


def test_la_trainer_retrieval(tmp_path):
    make_synth_clotho(str(tmp_path), "clotho_dev", n=6, seconds=1.05)
    cfg = compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CLAP",
        "monitor=LAMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=clotho_dev",
        "running.test_name=",
        "running.batch_size=2",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=6",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()
    report = mon.infer(mon.evalloader)
    assert "A->T" in report and "REF" in report


def test_esc_trainer_zero_shot(tmp_path):
    make_synth_esc50(str(tmp_path), seconds=1.05)
    cfg = compose([
        "+running=esc50",
        *TINY_MODEL,
        "+model/loss=ce_cls",
        "worker=ESClassifier",
        "monitor=ESCMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=esc50",
        "running.zero_shot=True",
        "running.batch_size=4",
        "running.epochs=1",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=True",
    ])
    mon = build_monitor(cfg)
    p1 = mon.learn()
    assert 0.0 <= p1 <= 100.0


def test_esc_trainer_supervised_folds(tmp_path):
    make_synth_esc50(str(tmp_path), n_per_class=4, seconds=1.05)
    cfg = compose([
        "+running=esc50",
        *TINY_MODEL,
        "+model/loss=ce_cls",
        "worker=ESClassifier",
        "monitor=ESCMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=esc50",
        "running.zero_shot=False",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mean = mon.learn()
    assert 0.0 <= mean <= 100.0
