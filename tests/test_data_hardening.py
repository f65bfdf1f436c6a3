"""Regressions for data-layer review findings: EOT-preserving caption
truncation, equal-length host shards, inf-tolerant eval caps, the on-device
siamese view sentinel, and captionless-record drops."""

import numpy as np
import pytest

from vipant_tpu.config import compose
from data_synth import make_synth_va_index

from test_trainers import TINY_MODEL


def test_pad_truncation_keeps_eot():
    """A caption whose BPE sequence exceeds the 77-token context must keep
    its final EOT when truncated — the text encoder pools at argmax(ids),
    which relies on EOT (the max id) being present (regression: plain
    toks[:77] pooled an arbitrary mid-caption token)."""
    from vipant_tpu.data.audio_text import AudioTextDatasetSrc
    from vipant_tpu.tokenizer import tokenize

    long_cap = "a dog barks " * 40  # way past 77 BPE tokens
    toks = tokenize([long_cap], as_list=True)[0]
    assert len(toks) > 77
    ds = AudioTextDatasetSrc.__new__(AudioTextDatasetSrc)
    ds.ctx_len = 77
    padded = ds._pad(list(toks))
    assert padded.shape == (77,)
    assert padded[-1] == toks[-1]  # EOT survives
    assert int(np.argmax(padded)) == 76  # pooling position = EOT
    # short caption unchanged
    short = tokenize(["a dog"], as_list=True)[0]
    p2 = ds._pad(list(short))
    assert list(p2[: len(short)]) == list(short)
    assert p2[len(short):].sum() == 0


def test_shard_for_host_equal_lengths():
    """Host shards must have EQUAL length (DistributedSampler-style wrap
    padding): a ragged split desyncs per-host steps_per_epoch and hangs the
    SPMD collectives at the epoch tail."""
    from vipant_tpu.data.indexfile import shard_for_host

    recs = list(range(7))
    s0 = shard_for_host(recs, 0, 2)
    s1 = shard_for_host(recs, 1, 2)
    assert len(s0) == len(s1) == 4
    assert set(s0 + s1) == set(recs)  # every record served (1 wrap dup)
    # N < num_processes: loop-padding keeps every shard non-ragged
    shards = [shard_for_host([1], p, 4) for p in range(4)]
    assert [len(s) for s in shards] == [1, 1, 1, 1]
    assert shard_for_host([], 0, 4) == []
    # divisible case: unchanged semantics
    assert shard_for_host(list(range(8)), 1, 2) == [1, 3, 5, 7]


def test_eval_sample_limit_blessed_values(tmp_path):
    """unset/0/negative/inf all mean 'evaluate everything' (as blessed by
    Trainer._samples_cap) — int(float('inf')) used to crash the loader
    builds."""
    from vipant_tpu.data import build_image_audio_dataloader
    from vipant_tpu.data.indexfile import eval_sample_limit

    assert eval_sample_limit(None) is None
    assert eval_sample_limit(0) is None
    assert eval_sample_limit(-3) is None
    assert eval_sample_limit(float("inf")) is None
    assert eval_sample_limit("inf") is None
    assert eval_sample_limit(5) == 5
    assert eval_sample_limit(2.0) == 2

    make_synth_va_index(str(tmp_path), "train", n=4, seconds=1.05)
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        f"running.data_root={tmp_path}",
        "running.batch_size=2",
        "running.eval_samples=inf",
    ])
    loader = build_image_audio_dataloader(cfg, "train", train=False)
    assert sum(int(b.get("_count", len(b["name"]))) for b in loader) == 4


def test_on_device_siamese_ships_view_sentinel(tmp_path):
    """With multi_view + on_device and the aa loss off, the second audio
    view must ship the featurized rank-3 VIEW_SENTINEL — a truncated
    waveform slice would be treated as a raw waveform by the device
    frontend and crash the jitted fbank at eval (waveform shorter than
    one window)."""
    from vipant_tpu.data.image_audio import ImageAudioDatasetSiameseSrc
    from vipant_tpu.data.transforms_audio import VIEW_SENTINEL

    make_synth_va_index(str(tmp_path), "train", n=2, seconds=1.05)
    cfg = compose([
        "+running=siamese",
        *TINY_MODEL,
        "+model/loss=ce_va",
        f"running.data_root={tmp_path}",
        "running.audio.on_device=True",
        "running.audio.norms=[-4.93839311,5.75751113]",
    ])
    ds = ImageAudioDatasetSiameseSrc(cfg.running, "train", train=False)
    item = ds[0]
    assert item["audio_v1"].ndim == 1  # raw waveform view
    np.testing.assert_array_equal(item["audio_v2"], VIEW_SENTINEL)


def test_on_device_siamese_warns_without_norms(tmp_path):
    """The host FbankViews path hardcodes the AudioSet norms; the device
    frontend normalizes only from cfg — unset norms must warn loudly."""
    from vipant_tpu.data.image_audio import ImageAudioDatasetSiameseSrc

    make_synth_va_index(str(tmp_path), "train", n=2, seconds=1.05)
    cfg = compose([
        "+running=siamese",
        *TINY_MODEL,
        "+model/loss=ce_va",
        f"running.data_root={tmp_path}",
        "running.audio.on_device=True",
    ])
    with pytest.warns(UserWarning, match="norms unset"):
        ImageAudioDatasetSiameseSrc(cfg.running, "train", train=False)


def test_captionless_records_dropped(tmp_path):
    """A record whose caption cells are all empty is dropped loudly at
    list-build time instead of crashing np.random.choice(0) mid-epoch in a
    worker."""
    import json

    from vipant_tpu.data.audio_text import build_audiocaps_list

    with open(tmp_path / "audiocaps_x.jsonl", "w") as f:
        f.write(json.dumps({"id": "good", "captions": ["a dog barks"]}) + "\n")
        f.write(json.dumps({"id": "bad", "captions": []}) + "\n")

    class Run(dict):
        data_root = str(tmp_path)

    cfg = compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/loss=ce",
        f"running.data_root={tmp_path}",
    ])
    with pytest.warns(UserWarning, match="without any caption"):
        recs = build_audiocaps_list(cfg.running, "audiocaps_x")
    assert [r["id"] for r in recs] == ["good"]


def test_empty_index_fails_loud(tmp_path):
    from vipant_tpu.data.image_audio import ImageAudioDatasetSrc

    (tmp_path / "empty.jsonl").write_text("")
    cfg = compose([
        "+running=bimodal",
        *TINY_MODEL,
        "+model/loss=ce",
        f"running.data_root={tmp_path}",
    ])
    with pytest.raises(ValueError, match="no records"):
        ImageAudioDatasetSrc(cfg.running, "empty", train=True)
