"""E2E smoke tests for the trimodal, siamese, and AudioSet-clf trainers."""

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.train import build_monitor
from data_synth import make_synth_audioset, make_synth_va_index

from test_trainers import TINY_MODEL


def test_val_trainer_trimodal(tmp_path):
    make_synth_audioset(str(tmp_path), "as_train", n=8, seconds=1.05)
    cfg = compose([
        "+running=trimodal",
        *TINY_MODEL,
        "+model/loss=ce_val",
        "worker=CVALP",
        "monitor=VALMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=as_train",
        "running.eval_name=as_train",
        "running.clf=False",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=8",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()
    report = mon.infer(mon.evalloader)
    assert "VA:" in report and "AL:" in report
    # 4-tuple export parity
    export = mon.collect_model_export()
    assert set(export) == {"image", "audio", "text", "loss"}


def test_val_trainer_siamese_ties(tmp_path):
    """Trimodal with siamese sharing: audio encoder tied to image encoder."""
    make_synth_audioset(str(tmp_path), "as_train", n=8, seconds=1.05)
    cfg = compose([
        "+running=trimodal",
        *TINY_MODEL,
        "+model/loss=ce_val",
        "worker=CVALP",
        "monitor=VALMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=as_train",
        "running.eval_name=",
        "running.clf=False",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.siamese.alive=True",
        "running.siamese.amodules=[encoder]",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    assert ("audio/encoder", "image/encoder") in mon.ties
    # tied destination pruned from params; source present
    assert "encoder" not in mon.state.full_params()["audio"]
    mon.learn()


def test_vas_trainer_siamese_views(tmp_path):
    make_synth_va_index(str(tmp_path), "train", n=8, seconds=1.05)
    cfg = compose([
        "+running=siamese",
        *TINY_MODEL,
        "+model/loss=ce_va",
        "worker=CVASP",
        "monitor=VASMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=train",
        "running.eval_name=train",
        "running.multi_view=True",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=8",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()
    report = mon.infer(mon.evalloader)
    assert "I->A" in report


def test_as_trainer_clf_and_zero_shot(tmp_path):
    make_synth_audioset(str(tmp_path), "as_train", n=8, seconds=1.05)
    cfg = compose([
        "+running=audioset",
        *TINY_MODEL,
        "+model/loss=bce",
        "worker=ASClassifier",
        "monitor=ASMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=as_train",
        "running.eval_name=as_train",
        "running.clf=True",
        "running.mixup_rate=0.5",
        "running.weighted_sampling=True",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=8",
        "model.audio.freeze=False",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.output_dim == 2
    mon.learn()
    report = mon.infer(mon.evalloader)
    assert "mAP" in report
    zs = mon.zero_shot(mon.evalloader)
    assert "zero-shot" in zs
    dump = mon.encode_audios_dump(mon.evalloader, str(tmp_path / "emb.npz"))
    data = np.load(dump)
    assert data["v"].shape[1] == 32


@pytest.mark.parametrize("as_text", [True, False])
def test_val_trainer_external_captions(tmp_path, as_text):
    """External caption text / precomputed text embeddings replace the label
    prompts (parity: `/root/reference/cvap/data/audioset_cls.py:253-256,
    291-297` + `cvalp.py:65-104`)."""
    from data_synth import make_synth_audioset_captions

    make_synth_audioset(str(tmp_path), "as_train", n=8, seconds=1.05)
    make_synth_audioset_captions(str(tmp_path), "capembs", n=8, embed_dim=32, as_text=as_text)
    cfg = compose([
        "+running=trimodal",
        *TINY_MODEL,
        "+model/loss=ce_val",
        "worker=CVALP",
        "monitor=VALMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=as_train",
        "running.eval_name=as_train",
        "running.clf=False",
        "running.text_emb=capembs",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=8",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    batch = next(iter(mon.loader))
    if as_text:
        assert batch["text"].dtype == np.int32 and batch["text"].shape[1] == 77
    else:
        # precomputed embeddings pass through the text tower by dtype/rank
        assert batch["text"].dtype == np.float32 and batch["text"].shape[1] == 32
    mon.learn()
    report = mon.infer(mon.evalloader)
    assert "VA:" in report and "AL:" in report


@pytest.mark.parametrize("on_device", [False, True])
def test_val_trainer_label_map_zero_shot(tmp_path, on_device):
    """The label-map zero-shot report of the trimodal monitor — including
    the waveform-shipping mode, where eval batches carry raw audio that
    zero_shot must route through the device frontend (regression: it used
    to feed waveforms straight to encode_audio)."""
    make_synth_audioset(str(tmp_path), "as_train", n=8, seconds=1.05)
    frontend = ["running.audio.on_device=True"] if on_device else []
    cfg = compose(frontend + [
        "+running=trimodal",
        *TINY_MODEL,
        "+model/loss=ce_val",
        "worker=CVALP",
        "monitor=VALMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=as_train",
        "running.eval_name=as_train",
        "running.clf=False",
        "running.zero_shot=True",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=8",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()
    report = mon.infer(mon.evalloader)
    assert "A->T: p1 =" in report
    # infer reuses collect_features' audio embeddings (x2) for zero-shot;
    # the reuse path must match a fresh encode pass exactly
    data = mon.collect_features(mon.evalloader, samples=8)
    zs_reuse = mon.zero_shot(mon.evalloader, samples=8, audio_embs=data["x2"])
    zs_fresh = mon.zero_shot(mon.evalloader, samples=8)
    assert zs_reuse == zs_fresh


def test_la_mid_train_eval_gate():
    """LATrainer skips the periodic retrieval eval while CE >= 5
    (parity: `/root/reference/cvap/monitor/clap.py:245,256`); the base
    trainer never skips; running.eval_loss_bound overrides."""
    from vipant_tpu.train.monitors import LATrainer
    from vipant_tpu.train.trainer import Trainer

    t = object.__new__(LATrainer)
    t.cfg = compose(["+running=clotho"])
    assert t.mid_train_eval_ok(4.99)
    assert not t.mid_train_eval_ok(5.0)

    t.cfg = compose(["+running=clotho", "running.eval_loss_bound=inf"])
    assert t.mid_train_eval_ok(1e9)

    base = object.__new__(Trainer)
    assert base.mid_train_eval_ok(float("inf"))


class _CapturingEcho:
    def __init__(self):
        self.msgs = []

    def info(self, m):
        self.msgs.append(str(m))

    def error(self, m):
        self.msgs.append(str(m))


def test_midtrain_test_pass_and_sample_caps(tmp_path):
    """Save-time evals run BOTH the eval and test loaders under their
    sample budgets (parity: `/root/reference/cvap/monitor/cvalp.py:240-264`,
    eval_samples/test_samples at `/root/reference/cvap/monitor/cvap.py:252-254`).
    eval_samples additionally truncates eval datasets at build time
    (`data/image_audio.py:49`); test_samples is applied as an iteration cap."""
    make_synth_audioset(str(tmp_path), "as_train", n=8, seconds=1.05)
    cfg = compose([
        "+running=trimodal",
        *TINY_MODEL,
        "+model/loss=ce_val",
        "worker=CVALP",
        "monitor=VALMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=as_train",
        "running.eval_name=as_train",
        "running.test_name=as_train",
        "running.clf=False",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=250",
        "running.test_samples=4",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.testloader is not None

    # iteration-cap budget: stops feature collection after the first
    # batch that reaches it (batch 4, cap 4 -> exactly one batch)
    data = mon.collect_features(mon.evalloader, samples=4)
    assert data["x1"].shape[0] == 4
    full = mon.collect_features(mon.evalloader)
    assert full["x1"].shape[0] == 8
    assert mon._samples_cap("eval_samples") == 250.0
    assert mon._samples_cap("test_samples") == 4.0

    # the save-time hook emits an eval report AND a capped TEST report
    echo = _CapturingEcho()
    mon.echo = echo
    mon.mid_train_evals(0.0)
    test_msgs = [m for m in echo.msgs if m.startswith("TEST ")]
    assert test_msgs and "@ 4" in test_msgs[0], echo.msgs
    assert sum("VA:" in m for m in echo.msgs) == 2  # eval + test reports
    assert any("@ 8" in m and not m.startswith("TEST") for m in echo.msgs)
