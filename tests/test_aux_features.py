"""Aux capabilities: gold-file grouped report, caption-embedding dump,
repeated retrieval over a log manifest."""

import json
import os

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.tokenizer import tokenize
from vipant_tpu.train import build_monitor
from data_synth import make_synth_clotho, make_synth_va_index

from test_trainers import TINY_MODEL


def test_va_infer_with_gold_file(tmp_path):
    make_synth_va_index(str(tmp_path / "d"), "train", n=6, seconds=1.05)
    # gold labels: alternate two classes
    gold = tmp_path / "gold.jsonl"
    with open(gold, "w") as f:
        for i in range(6):
            f.write(json.dumps({"id": f"clip{i}", "labels": [f"/m/{i % 2}"]}) + "\n")
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/d",
        "running.data_name=train",
        "running.eval_name=train",
        "running.batch_size=2",
        "running.eval_samples=6",
        f"running.gold_file={gold}",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=True",
    ])
    mon = build_monitor(cfg)
    report = mon.infer(mon.evalloader)
    assert "mAP" in report and "P@1" in report


def test_la_encode_text_dump_and_manifest_eval(tmp_path):
    make_synth_clotho(str(tmp_path), "clotho_dev", n=4, seconds=1.05)
    cfg = compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CLAP",
        "monitor=LAMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=clotho_dev",
        "running.test_name=clotho_dev",
        "running.batch_size=2",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=2",
        "running.save_epoch=False",
        "running.eval_samples=4",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()  # trains, saves at step 2, ends with a TEST eval

    # caption-embedding dump
    texts = tokenize(["a dog barking", "heavy rain"])
    out = mon.encode_text_dump(np.asarray(texts), str(tmp_path / "caps.npz"))
    assert np.load(out)["v"].shape == (2, 32)

    # repeated retrieval over the training log's checkpoint manifest
    log = os.path.join(f"{tmp_path}/run", "test", "train_0.out")
    assert os.path.exists(log)
    mon.cfg.set_path("model_file", "train_0.out")
    reports = mon.repeated_retrieval()
    assert len(reports) >= 1
    assert all("A->T" in r for r in reports)

    # per-audio-name caption-embedding dump (the reference's clap.encode_text
    # asset layout: caption/audiocap/{clip_model_name}/{name}.npz, v=[ncap,D])
    mon.cfg.running.set_path("clip_model_name", "ViT-B-32")
    out_root = mon.encode_text(mon.evalloader)
    assert out_root.endswith("caption/audiocap/vit-b-32")
    import glob
    files = sorted(glob.glob(os.path.join(out_root, "*.npz")))
    assert len(files) == 4  # one per audio clip
    v = np.load(files[0])["v"]
    assert v.shape == (5, 32)  # 5 captions per clip, embed dim 32


def test_checkpoint_retention_and_resave(tmp_path):
    """keep_last pruning must never delete the checkpoint just written —
    including a resume that saves an EARLIER step than stale later ones —
    and re-saving an existing step overwrites instead of crashing."""
    import numpy as np

    from vipant_tpu.ckpt.orbax_io import save_checkpoint

    state = {"w": np.arange(4, dtype=np.float32)}
    d = str(tmp_path / "ckpts")
    for step in (100, 200, 300):
        save_checkpoint(d, step, state, keep_last=2)
    import os

    assert sorted(os.listdir(d)) == ["00000200", "00000300"]

    # resume from an earlier point: saving step 150 must keep 00000150
    save_checkpoint(d, 150, state, keep_last=2)
    assert "00000150" in os.listdir(d)

    # re-saving the same step overwrites (no existing-directory crash)
    save_checkpoint(d, 150, {"w": np.ones(4, np.float32)}, keep_last=2)
    assert "00000150" in os.listdir(d)


@pytest.mark.slow  # compile-heavy; covered by faster siblings in the fast tier
def test_metrics_jsonl_sink(tmp_path):
    """metrics_jsonl=true writes machine-readable step telemetry beside the
    rank logs (beyond reference: its only sink was train_0.out)."""
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from data_synth import make_synth_va_index
    from vipant_tpu.config import compose
    from vipant_tpu.train import build_monitor

    make_synth_va_index(str(tmp_path / "data"), "train", n=8, seconds=1.05)
    make_synth_va_index(str(tmp_path / "data"), "val", n=4, seconds=1.05)
    cfg = compose([
        "+running=bimodal", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=dummy", "+model/loss=ce", "+optimizer=standard",
        "+running/audio=default",
        "model.image.width=64", "model.image.embed_dim=32",
        "model.image.encoder.layers=2", "model.image.heads=4",
        "running.audio.max_len=100", "model.audio.pre_encoder.stride=[16,24]",
        "worker=CVAP", "monitor=VAMonitor",
        f"running.data_root={tmp_path}/data", "running.data_name=train",
        "running.eval_name=val", "running.eval_samples=4",
        "running.batch_size=4", "running.epochs=1",
        "running.peep_rate=1", "running.save_rate=1000000",
        "running.save_epoch=False", f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run", "model_file=", "eval=False",
        "mesh.data=2", "metrics_jsonl=true",
    ])
    mon = build_monitor(cfg)
    mon.learn()
    path = os.path.join(str(tmp_path), "run", "test", "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) >= 2
    for r in rows:
        assert {"ts", "epoch", "step", "loss", "loss_avg", "lr", "samples_per_sec"} <= set(r)
        assert np.isfinite(r["loss"])
    assert rows[-1]["step"] > rows[0]["step"]


def test_save_cadence_independent_of_peep_and_warmup_force_eval(tmp_path):
    """A save step whose loss was never peeked must not crash (the save
    branch reads the loss gate itself), and warmup completion forces an
    eval+save like the reference's SGDR force_eval
    (`/root/reference/cvap/monitor/clap.py:190-200`)."""
    make_synth_va_index(str(tmp_path / "d"), "train", n=8, seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/d",
        "running.data_name=train",
        "running.eval_name=train",
        "running.batch_size=2",
        "running.epochs=1",
        "running.peep_rate=5",   # never fires before the save below
        "running.save_rate=3",   # fires at step 3 with no peeked loss
        "running.save_epoch=False",
        "running.eval_samples=4",
        "optimizer.use_lars=False",
        "optimizer.warmup=True",
        "optimizer.warmup_steps=2",  # force_eval at step 2
        "optimizer.batch_sch=True",
        "optimizer.steps=[1]",       # MultiStepLR milestone: epoch 1 = step 4
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()  # 4 steps: force save at 2 (warmup done), save at 3
    steps = sorted(
        d for d in os.listdir(f"{tmp_path}/run/test") if d.startswith("0")
    )
    assert any(int(s) == 2 for s in steps), steps  # warmup force_eval save
    assert any(int(s) == 3 for s in steps), steps  # cadence save, no NameError
    assert any(int(s) == 4 for s in steps), steps  # MultiStepLR milestone force_eval
