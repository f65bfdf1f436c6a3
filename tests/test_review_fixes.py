"""Regressions for the code-review findings: BatchNorm configs through the
trainer, grad-cache with on-device audio and siamese ties, chunk sizing,
loader producer-thread shutdown."""

import threading
import time

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.train import build_monitor
from data_synth import make_synth_clotho, make_synth_va_index

from test_trainers import TINY_MODEL


def test_va_trainer_with_barlow_batch_stats(tmp_path):
    """BarlowLossHead carries BatchNorm batch_stats — the adapter must
    thread the mutable collection through the train step."""
    make_synth_va_index(str(tmp_path / "d"), "train", n=4, seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=barlow",
        "model.loss.layers=[16,16]",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/d",
        "running.data_name=train",
        "running.eval_name=",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.has_batch_stats
    mon.learn()  # must not raise


def test_grad_cache_with_on_device_audio(tmp_path):
    make_synth_clotho(str(tmp_path), "clotho_dev", n=4, seconds=1.05)
    cfg = compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/loss=ce",
        "worker=CLAP",
        "monitor=LAMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=",
        "running.test_name=",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.grad_cache.alive=True",
        "running.grad_cache.chunk_size=2",
        "running.audio.on_device=True",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mon.learn()  # waveform batches must be featurized inside the GC step


def test_gc_chunk_sizing():
    """ceil-based chunk count: chunks never exceed the configured size."""
    for bsz, chunk, expect in [(432, 128, 4), (100, 128, 1), (8, 3, 4), (6, 2, 3)]:
        n = max(-(-bsz // max(chunk, 1)), 1)
        while bsz % n != 0:
            n += 1
        assert bsz // n <= chunk or n == 1 and bsz <= chunk, (bsz, chunk, n)
        assert n == expect, (bsz, chunk, n, expect)


def test_loader_early_break_stops_producer(tmp_path):
    from vipant_tpu.data.loader import DataLoader

    class SlowDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            time.sleep(0.005)
            return np.zeros(4, np.float32)

    loader = DataLoader(
        SlowDataset(), batch_size=4, collate_fn=lambda items: np.stack(items),
        num_workers=2, prefetch=1,
    )
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # early abandonment
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_worker_seed_mixing_no_epoch_collisions():
    """Per-item seeds must not collide across adjacent epochs at shifted
    positions (the old linear formula replayed epoch e's augmentation
    streams at epoch e+1, pos p-7919, on datasets larger than 7919)."""
    from vipant_tpu.data.loader import DataLoader  # noqa: F401 (module import)

    def seed_of(base, epoch, pos):
        return int(np.random.SeedSequence((base, epoch, pos)).generate_state(1)[0])

    seen = {}
    for epoch in range(3):
        for pos in range(0, 20000, 997):
            s = seed_of(0, epoch, pos)
            assert s not in seen, (epoch, pos, seen[s])
            seen[s] = (epoch, pos)


def test_esc_fold_loaders_honor_loader_backend(tmp_path):
    from data_synth import make_synth_esc50
    from vipant_tpu.data.esc50 import build_xfold_dataloader_list

    make_synth_esc50(str(tmp_path), seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce_cls",
        f"running.data_root={tmp_path}",
        "running.data_name=esc50",
        "running.batch_size=4",
        "loader_backend=process",
    ])
    loaders, classes, label_ids, extras = build_xfold_dataloader_list(cfg)
    for train_loader, eval_loader in loaders:
        for ld in (train_loader, eval_loader):
            if ld is not None:
                assert ld.backend == "process"


def test_async_retention_never_deletes_last_finalized(tmp_path):
    """keep_last=1 + async: the in-flight save must not count toward
    retention, or a crash before it commits would lose the run."""
    import jax.numpy as jnp

    from vipant_tpu.ckpt.orbax_io import save_checkpoint, wait_for_saves

    state = {"w": jnp.arange(4, dtype=jnp.float32)}
    d = str(tmp_path / "ck")
    for step in (1, 2, 3):
        save_checkpoint(d, step, state, keep_last=1, async_save=True)
        import os

        present = sorted(x for x in os.listdir(d) if x.isdigit())
        # the newest finalized step always survives alongside the in-flight
        assert f"{step:08d}" in present
        if step > 1:
            assert f"{step-1:08d}" in present, present
        if step > 2:
            assert f"{step-2:08d}" not in present, present
    wait_for_saves()


def test_partial_checkpoint_dirs_are_not_checkpoints(tmp_path):
    """A crashed async save leaves a step dir without a committed state/;
    latest_checkpoint must skip it, and retention must clean it up rather
    than let it displace the last good checkpoint."""
    import jax.numpy as jnp

    from vipant_tpu.ckpt.orbax_io import latest_checkpoint, save_checkpoint

    state = {"w": jnp.arange(4, dtype=jnp.float32)}
    d = str(tmp_path / "ck")
    save_checkpoint(d, 1, state)
    # fabricate a crash leftover: config.json written, state never committed
    import os

    junk = os.path.join(d, "00000002")
    os.makedirs(junk)
    open(os.path.join(junk, "config.json"), "w").write("{}")

    assert latest_checkpoint(d).endswith("00000001")

    save_checkpoint(d, 3, state, keep_last=1)
    present = sorted(x for x in os.listdir(d) if x.isdigit())
    assert present == ["00000003"], present  # junk cleaned, keep_last honored


def test_skip_gold_and_optional_test_loader():
    """Advisor round-3 fixes: SKIP_GOLD suppresses the eval-split gold_file
    fallback on TEST passes; a configured-but-missing test split degrades to
    testloader=None instead of raising; unsupported gold_file args warn."""
    from vipant_tpu.train.trainer import SKIP_GOLD, Trainer

    t = Trainer.__new__(Trainer)

    class Echo:
        msgs = []

        def info(self, m):
            self.msgs.append(m)

    t.echo = Echo()

    def boom():
        raise FileNotFoundError("no such split")

    assert t._optional_test_loader(boom, "missing_split") is None
    assert any("missing_split" in m for m in t.echo.msgs)

    ok = object()
    assert t._optional_test_loader(lambda: ok, "x") is ok

    # gold warning fires once for a real path, never for None/SKIP_GOLD
    t.echo.msgs.clear()
    t._warn_gold_unused(None)
    t._warn_gold_unused(SKIP_GOLD)
    assert not t.echo.msgs
    t._warn_gold_unused("/tmp/gold.jsonl")
    t._warn_gold_unused("/tmp/gold.jsonl")
    assert len(t.echo.msgs) == 1


def test_base_infer_skip_gold_suppresses_fallback(tmp_path):
    """With running.gold_file set and gold_file=SKIP_GOLD passed, the base
    infer must not produce a gold report (the TEST-pass contract)."""
    import numpy as np

    from vipant_tpu.config import Config
    from vipant_tpu.train.trainer import SKIP_GOLD, Trainer
    from vipant_tpu.utils import PhaseTimer

    gold = tmp_path / "gold.jsonl"
    gold.write_text('{"id": "a", "labels": ["x"]}\n')

    t = Trainer.__new__(Trainer)
    t.cfg = Config({"running": {"gold_file": str(gold)}})
    t.timer = PhaseTimer()
    feats = {
        "x1": np.eye(4, 8, dtype=np.float32),
        "x2": np.eye(4, 8, dtype=np.float32),
        "names": np.asarray(["a", "b", "c", "d"]),
    }
    t.collect_features = lambda loader, samples=None: feats

    with_gold = t.infer(None)
    without = t.infer(None, gold_file=SKIP_GOLD)
    assert with_gold != without
    assert len(without) < len(with_gold)
