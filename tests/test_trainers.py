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
        "running.epochs=2",
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


def test_esc_summary_report_best_and_max_epochs():
    """The reference's cross-fold summary: mean±std at the best COMMON
    epoch (headline) plus per-fold maxima
    (`/root/reference/cvap/monitor/esc50_clf.py:104-120`)."""
    import types

    import numpy as np

    from vipant_tpu.train.monitors import ESCTrainer

    lines = []
    stub = types.SimpleNamespace(echo=types.SimpleNamespace(info=lines.append))
    report = np.array([[50.0, 75.0, 60.0], [60.0, 70.0, 65.0]])
    mean = ESCTrainer.summary_report(stub, report)
    # column sums [110, 145, 125] -> best common epoch 1; mean(75, 70) = 72.5
    assert abs(mean - 72.5) < 1e-9
    assert any("Best mean and std: 72.50" in l for l in lines)
    # per-fold maxima 75 (epoch 1) and 70 (epoch 1)
    assert any("Max mean and std: 72.50" in l and "[1, 1]" in l for l in lines)


def test_mid_epoch_exact_resume(tmp_path):
    """A run killed mid-epoch and resumed from its checkpoint must land on
    EXACTLY the state of an uninterrupted run: the restored global_step
    fast-forwards the deterministic epoch order to the right batch offset
    (the reference had no resume at all — SURVEY.md §5)."""
    import jax

    from data_synth import make_synth_va_index

    make_synth_va_index(str(tmp_path / "d"), "train", n=8, seconds=1.0)

    def cfg_for(tag, save_rate):
        return compose([
            "+running=bimodal",
            *TINY_MODEL,
            "+model/loss=ce",
            "worker=CVAP",
            "monitor=VAMonitor",
            f"running.data_root={tmp_path}/d",
            "running.data_name=train",
            "running.eval_name=",
            "running.audio.transform_fbank=False",
            "running.audio.transform_audio=null",
            "running.batch_size=4",
            "running.epochs=2",        # 2 steps/epoch -> 4 steps total
            "running.peep_rate=100",
            f"running.save_rate={save_rate}",
            "running.save_epoch=False",
            f"alias_root={tmp_path}/{tag}",
            f"model_root={tmp_path}/{tag}",
            "model_file=",
            "eval=False",
        ])

    def checksum(state):
        import jax.numpy as jnp

        leaves = jax.tree_util.tree_leaves((state.params, state.opt_state))
        return sum(
            float(jnp.sum(jnp.abs(x)))
            for x in leaves
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        )

    # A: uninterrupted 4 steps
    mon_a = build_monitor(cfg_for("a", 10**9))
    mon_a.learn()
    assert mon_a.global_step == 4

    # B1: same run but checkpointing at step 3 (mid-epoch 1), then "killed"
    mon_b1 = build_monitor(cfg_for("b", 3))
    mon_b1.learn()
    assert mon_b1.global_step == 4

    # B2: fresh process state resumes from the step-3 checkpoint; must skip
    # epoch 0 and the first batch of epoch 1, run ONE step, and match A
    cfg_b2 = cfg_for("b", 10**9)
    cfg_b2.model_file = "00000003"
    mon_b2 = build_monitor(cfg_b2)
    assert mon_b2.global_step == 3
    mon_b2.learn()
    assert mon_b2.global_step == 4
    a, b = checksum(mon_a.state), checksum(mon_b2.state)
    assert abs(a - b) < 1e-4 * max(abs(a), 1.0), (a, b)
    assert int(mon_b2.state.step) == int(mon_a.state.step) == 4


def test_async_checkpoint_save_and_resume(tmp_path):
    """async_ckpt=true: saves snapshot to host and commit in the background
    (one in-flight at a time); the final state restores exactly."""
    import jax

    from data_synth import make_synth_va_index
    from vipant_tpu.ckpt import load_checkpoint
    from vipant_tpu.ckpt.orbax_io import wait_for_saves

    make_synth_va_index(str(tmp_path / "d"), "train", n=8, seconds=1.0)
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
        "running.peep_rate=100",
        "running.save_rate=1",     # save at EVERY step: exercises the
        "running.save_epoch=False",  # wait-for-previous in-flight path
        "async_ckpt=True",
        "keep_last_ckpts=2",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()
    assert mon.global_step == 2
    wait_for_saves()
    import os

    ckpt_dir = os.path.join(str(cfg.alias_root), str(cfg.model_name))
    assert sorted(os.listdir(ckpt_dir)) >= ["00000001", "00000002"]
    restored = load_checkpoint(os.path.join(ckpt_dir, "00000002"), mon.state)
    for a, b in zip(
        jax.tree_util.tree_leaves(mon.state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        assert bool((np.asarray(a) == np.asarray(b)).all())
    assert int(restored.step) == 2
