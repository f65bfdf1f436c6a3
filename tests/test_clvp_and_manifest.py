"""CLVP image↔text eval via LAMonitor (dataloader=lv), the log-manifest
repeated-eval mechanism, and the fbank-statistics job."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from vipant_tpu.ckpt import extract_model_files
from vipant_tpu.config import compose
from vipant_tpu.train import build_monitor
from data_synth import make_synth_va_index

from test_trainers import TINY_MODEL


def _make_image_text_index(root, name="audiocaps_frames", n=6):
    os.makedirs(os.path.join(root, name, "frame"), exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(root, f"{name}.jsonl"), "w") as f:
        for i in range(n):
            Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
                os.path.join(root, name, "frame", f"v{i}.0.jpg")
            )
            rec = {
                "id": f"v{i}",
                "dir": name,
                "frame": "0.jpg",
                "captions": [f"scene number {i} take {j}" for j in range(5)],
            }
            f.write(json.dumps(rec) + "\n")


def test_clvp_image_text_retrieval(tmp_path):
    _make_image_text_index(str(tmp_path))
    cfg = compose([
        "+running=audiocaps",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CLVP",
        "monitor=LAMonitor",
        "running.dataloader=lv",
        f"running.data_root={tmp_path}",
        "running.data_name=audiocaps_frames",
        "running.eval_name=audiocaps_frames",
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
        "eval=True",
    ])
    mon = build_monitor(cfg)
    report = mon.learn()
    assert "A->T" in report  # 1-vs-5 report over image↔caption


def test_extract_model_files(tmp_path):
    log = tmp_path / "train_0.out"
    log.write_text(
        "08/16 I vipant: epoch 0 step 5 loss 1.0\n"
        "08/16 I vipant: saving the checkpoint to /runs/test/00000005\n"
        "08/16 I vipant: saving the checkpoint to /runs/test/00000010\n"
    )
    assert extract_model_files(str(log)) == [
        "/runs/test/00000005",
        "/runs/test/00000010",
    ]


def test_eval_norms_job(tmp_path):
    make_synth_va_index(str(tmp_path / "data"), "train", n=4, seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/data",
        "running.data_name=train",
        "running.eval_name=train",
        "running.batch_size=2",
        "running.eval_samples=4",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=True",
    ])
    mon = build_monitor(cfg)
    mean, std = mon.eval_norms(mon.evalloader)
    assert std > 0
    assert -30 < mean < 10  # log-mel scale
