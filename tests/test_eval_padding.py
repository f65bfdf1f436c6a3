"""Eval-batch padding: fixed shapes with pad rows trimmed from metrics."""

import numpy as np

from vipant_tpu.config import compose
from vipant_tpu.data import build_image_audio_dataloader
from vipant_tpu.train import build_monitor
from data_synth import make_synth_va_index

from test_trainers import TINY_MODEL


def test_eval_loader_pads_final_batch(tmp_path):
    make_synth_va_index(str(tmp_path), "val", n=5, seconds=1.05)  # 5 % 4 != 0
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        f"running.data_root={tmp_path}",
        "running.batch_size=4",
        "running.eval_samples=5",
    ])
    loader = build_image_audio_dataloader(cfg, "val", train=False)
    batches = list(loader)
    assert len(batches) == 2
    # both batches have the full shape; the second carries the true count
    assert batches[0]["audio"].shape[0] == 4
    assert batches[1]["audio"].shape[0] == 4
    assert batches[1]["_count"] == 1


def test_infer_trims_padding(tmp_path):
    make_synth_va_index(str(tmp_path / "d"), "train", n=5, seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/d",
        "running.data_name=train",
        "running.eval_name=train",
        "running.batch_size=4",
        "running.eval_samples=5",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=True",
    ])
    mon = build_monitor(cfg)
    data = mon.collect_features(mon.evalloader)
    assert data["x1"].shape[0] == 5  # not 8
    assert len(data["names"]) == 5
    report = mon.infer(mon.evalloader)
    assert "@ 5" in report
