"""Packed VA shards (data/packed.py): pack round-trip vs the npz path,
vectorized get_batch, the loader's one-task-per-batch fast path, and the
trainer running end-to-end on a pak split."""

import numpy as np
import pytest

from data_synth import make_synth_va_index, make_synth_va_npz_index
from vipant_tpu.config import compose
from vipant_tpu.data import build_image_audio_dataloader
from vipant_tpu.data.packed import ImageAudioDatasetPak, pack_image_audio

NORMS = [-4.9384, 5.7575]


def _cfg(root, name, extra=()):
    return compose([
        "+running=bimodal", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=transformer_val", "+running/audio=default",
        f"running.data_root={root}", "running.batch_size=4",
        "running.audio.max_len=100",
        f"running.audio.norms=[{NORMS[0]}, {NORMS[1]}]",
        "running.audio.ship_bf16=True",
        "running.image_uint8=True",
        "num_proc=2",
        *extra,
    ])


@pytest.fixture(scope="module")
def pak_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pak"))
    make_synth_va_npz_index(root, "npz_train", n=6, frames=120)
    cfg = _cfg(root, "npz_train")
    out = pack_image_audio(cfg.running, "npz_train", pack_len=120)
    assert out.endswith("pak_npz_train.pak")
    return root


def test_pack_roundtrip_vs_npz(pak_root):
    """Eval-mode pak items equal the npz dataset's items cast to bf16
    (same normalization, same deterministic crop, same image crop)."""
    import ml_dtypes

    cfg = _cfg(pak_root, "npz_train", ["running.audio.transform_fbank=False"])
    cfg_npz = _cfg(
        pak_root, "npz_train",
        ["running.audio.transform_fbank=False", "running.audio.ship_bf16=True"],
    )
    from vipant_tpu.data.image_audio import ImageAudioDatasetNpz

    pak = ImageAudioDatasetPak(cfg.running, "pak_npz_train", train=False)
    npz = ImageAudioDatasetNpz(cfg_npz.running, "npz_train", train=False)
    assert len(pak) == len(npz) == 6
    for i in range(6):
        a, b = pak[i], npz[i]
        assert a["name"] == b["name"]
        assert a["audio"].dtype == np.dtype(ml_dtypes.bfloat16)
        # pak normalizes f32 then casts once at pack time; npz ship_bf16
        # casts the same f32 values at item time — bit-identical
        np.testing.assert_array_equal(
            np.asarray(a["audio"]), np.asarray(b["audio"])
        )
        assert a["image"].dtype == np.uint8
        np.testing.assert_array_equal(a["image"], b["image"])


def test_get_batch_matches_items_and_loader_fast_path(pak_root):
    cfg = _cfg(pak_root, "npz_train", ["running.audio.transform_fbank=False"])
    ds = ImageAudioDatasetPak(cfg.running, "pak_npz_train", train=False)
    b = ds.get_batch([1, 3, 4])
    assert b["audio"].shape == (3, 1, 100, 128)
    assert b["image"].shape == (3, 3, 224, 224)
    for k, i in enumerate([1, 3, 4]):
        it = ds[i]
        np.testing.assert_array_equal(np.asarray(b["audio"][k, 0]), np.asarray(it["audio"]))
        np.testing.assert_array_equal(b["image"][k], it["image"])
        assert b["name"][k] == it["name"]

    loader = build_image_audio_dataloader(cfg, "pak_npz_train", False)
    batches = list(loader)
    # eval pads the last partial batch (pad_last) and carries "_count"
    assert sum(x.get("_count", len(x["name"])) for x in batches) == 6
    assert batches[0]["audio"].shape == (4, 1, 100, 128)


def test_train_crop_and_masks(pak_root):
    """pack_len (120) > max_len (100): train crops a random window using
    the recorded true lengths; SpecAugment masks zero in-place."""
    cfg = _cfg(pak_root, "npz_train", [
        "running.audio.transform_fbank=True",
        "running.audio.fbank_transforms=[[TimeMasking, [50]], [FrequencyMasking, [64]]]",
    ])
    ds = ImageAudioDatasetPak(cfg.running, "pak_npz_train", train=True)
    assert int(ds.lengths[0]) == 120
    np.random.seed(0)
    starts = {ds._start(0) for _ in range(50)}
    assert len(starts) > 1 and max(starts) <= 20
    b = ds.get_batch([0, 1, 2, 3])
    # synth fbanks are dense standard normals — zero runs only via masks
    assert (np.asarray(b["audio"]).astype(np.float32) == 0).mean() > 0.01
    # eval applies neither crop nor masks
    dse = ImageAudioDatasetPak(cfg.running, "pak_npz_train", train=False)
    assert dse._start(0) == 0 and dse.transform_fbank is None


def test_pak_guards(pak_root):
    with pytest.raises(ValueError, match="ship_bf16"):
        cfg = _cfg(pak_root, "npz_train", ["running.audio.ship_bf16=False"])
        ImageAudioDatasetPak(cfg.running, "pak_npz_train", train=False)
    with pytest.raises(ValueError, match="norms"):
        cfg = _cfg(pak_root, "npz_train", ["running.audio.norms=[0.0, 1.0]"])
        ImageAudioDatasetPak(cfg.running, "pak_npz_train", train=False)


def test_pak_process_backend(pak_root):
    cfg = _cfg(pak_root, "npz_train", [
        "loader_backend=process",
        "running.audio.transform_fbank=False",
    ])
    loader = build_image_audio_dataloader(cfg, "pak_npz_train", False)
    assert loader.backend == "process"
    try:
        batches = list(loader)
        assert sum(x.get("_count", len(x["name"])) for x in batches) == 6
    finally:
        loader.shutdown()


def test_pak_trainer_epoch(pak_root, tmp_path):
    """The production monitor trains one epoch off a pak split (device
    frontend upcasts bf16 audio + normalizes uint8 images)."""
    from vipant_tpu.train import build_monitor

    cfg = _cfg(pak_root, "npz_train", [
        "+model/loss=ce", "+optimizer=standard",
        "model.image.width=64", "model.image.embed_dim=32",
        "model.image.encoder.layers=2", "model.image.heads=4",
        "model.text.name=DummyHead",
        "model.audio.pre_encoder.stride=[16,24]",
        "optimizer.use_lars=False", "optimizer.warmup=False",
        "verbose=False", "mesh.data=1", "worker=CVAP", "monitor=VAMonitor",
        "running.data_name=pak_npz_train", "running.eval_name=",
        "running.epochs=1", "running.peep_rate=1",
        "running.save_rate=1000000", "running.save_epoch=False",
        f"alias_root={tmp_path}/run", f"model_root={tmp_path}/run",
        "model_file=", "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.audio_bf16_fbank and mon.needs_device_frontend
    mon.epoch(0)
    assert mon.global_step == 1


def test_pack_from_wav_src(tmp_path):
    """Packing a raw-wav index featurizes with eval semantics and records
    true frame lengths."""
    root = str(tmp_path)
    make_synth_va_index(root, "train", n=3, seconds=1.0)
    cfg = _cfg(root, "train")
    pack_image_audio(cfg.running, "train", pack_len=150, out_name="pak_train")
    ds = ImageAudioDatasetPak(cfg.running, "pak_train", train=False)
    assert len(ds) == 3
    # 1 s @16 kHz, 25 ms window / 10 ms shift -> 98 frames
    assert 90 <= int(ds.lengths[0]) <= 100
    it = ds[0]
    assert it["audio"].shape == (100, 128)
    # featurized rows beyond the true length carry the normalized-zero
    # value (the src path pads BEFORE normalization)
    a = np.asarray(ds.audio[0]).astype(np.float32)
    pad_val = (0.0 - NORMS[0]) / NORMS[1]
    np.testing.assert_allclose(
        a[int(ds.lengths[0]) + 1 :], pad_val, atol=0.01
    )


def test_pack_with_image_emb(tmp_path):
    """pack.image_emb: per-frame embeddings pack alongside audio; a
    frame_emb-configured dataset ships [D] floats instead of images (the
    femb production path, serve --task embed_frames)."""
    root = str(tmp_path)
    make_synth_va_npz_index(root, "npz_train", n=4, frames=120)
    import os

    os.makedirs(f"{root}/femb", exist_ok=True)
    rng = np.random.default_rng(3)
    for i in range(4):
        np.savez(f"{root}/femb/clip{i}.0.npz", v=rng.standard_normal(32).astype(np.float32))
    cfg = _cfg(root, "npz_train", ["running.frame_emb=femb"])
    pack_image_audio(cfg.running, "npz_train", pack_len=120, image_emb=True)
    ds = ImageAudioDatasetPak(cfg.running, "pak_npz_train", train=False)
    assert ds.image_emb is not None
    b = ds.get_batch([0, 2])
    assert b["image"].shape == (2, 32) and b["image"].dtype == np.float32
    want = np.load(f"{root}/femb/clip2.0.npz")["v"]
    np.testing.assert_array_equal(b["image"][1], want)
    # without frame_emb in the config the same pack serves uint8 images
    cfg2 = _cfg(root, "npz_train")
    ds2 = ImageAudioDatasetPak(cfg2.running, "pak_npz_train", train=False)
    assert ds2.image_emb is None
    assert ds2.get_batch([0])["image"].dtype == np.uint8


def test_short_clip_padding_matches_npz(tmp_path):
    """Clips shorter than max_len: pak pad rows must equal the npz path's
    pad-then-normalize value ((0-mean)/std), not literal zero."""
    import ml_dtypes

    root = str(tmp_path)
    make_synth_va_npz_index(root, "npz_train", n=3, frames=60)  # < max_len
    cfg = _cfg(root, "npz_train", ["running.audio.transform_fbank=False"])
    pack_image_audio(cfg.running, "npz_train", pack_len=60)
    from vipant_tpu.data.image_audio import ImageAudioDatasetNpz

    pak = ImageAudioDatasetPak(cfg.running, "pak_npz_train", train=False)
    npz = ImageAudioDatasetNpz(cfg.running, "npz_train", train=False)
    assert pak.max_len == 100 and pak.pack_len == 60
    for i in range(3):
        a, b = pak[i], npz[i]
        assert a["audio"].shape == b["audio"].shape == (100, 128)
        np.testing.assert_array_equal(np.asarray(a["audio"]), np.asarray(b["audio"]))
        pad = np.asarray(a["audio"][60:]).astype(np.float32)
        want = np.float32((0.0 - NORMS[0]) / NORMS[1])
        np.testing.assert_allclose(pad, float(np.asarray(want, ml_dtypes.bfloat16)))


def test_pak_pickles_without_materializing_mmaps(pak_root):
    """Process workers receive the dataset by pickle: the pack arrays must
    reopen from disk in the worker, not serialize (a production pack is
    tens of GB)."""
    import pickle

    cfg = _cfg(pak_root, "npz_train", ["running.audio.transform_fbank=False"])
    ds = ImageAudioDatasetPak(cfg.running, "pak_npz_train", train=False)
    blob = pickle.dumps(ds)
    assert len(blob) < ds.audio.nbytes  # 6*120*128*2 = 184 KB of audio alone
    ds2 = pickle.loads(blob)
    b1, b2 = ds.get_batch([0, 2]), ds2.get_batch([0, 2])
    np.testing.assert_array_equal(np.asarray(b1["audio"]), np.asarray(b2["audio"]))
    np.testing.assert_array_equal(b1["image"], b2["image"])


def test_pak_thread_batches_reproducible_and_resume(pak_root):
    """Per-batch seeds: pak train batches replay exactly across runs AND
    across a mid-epoch resume, even on the thread backend (per-item paths
    only achieve this with process workers)."""
    cfg = _cfg(pak_root, "npz_train", [
        "running.audio.transform_fbank=True",
        "running.audio.fbank_transforms=[[TimeMasking, [50]]]",
    ])

    def batches(start_batch=0):
        loader = build_image_audio_dataloader(cfg, "pak_npz_train", True)
        loader.set_epoch(2, start_batch=start_batch)
        return [np.asarray(b["audio"]).astype(np.float32) for b in loader]

    a, b = batches(), batches()
    assert len(a) == 1  # 6 clips, B=4, drop_last
    np.testing.assert_array_equal(a[0], b[0])
    # masks actually engaged (dense synth normals -> zeros only via masks)
    assert (a[0] == 0).mean() > 0.001


def test_pak_host_sharding(pak_root):
    """Multi-host: each process sees a disjoint records shard."""
    cfg = _cfg(pak_root, "npz_train", ["running.audio.transform_fbank=False"])
    l0 = build_image_audio_dataloader(cfg, "pak_npz_train", False, 0, 2)
    l1 = build_image_audio_dataloader(cfg, "pak_npz_train", False, 1, 2)
    n0 = [n for b in l0 for n in b["name"][: b.get("_count", len(b["name"]))]]
    n1 = [n for b in l1 for n in b["name"][: b.get("_count", len(b["name"]))]]
    assert len(n0) + len(n1) == 6 and not set(n0) & set(n1)


# ---------------------------------------------------------------------------
# audio_text packs (VERDICT r4 #6)
# ---------------------------------------------------------------------------


def _at_cfg(root, extra=()):
    return compose([
        "+running=clotho", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=transformer_val", "+running/audio=default",
        f"running.data_root={root}", "running.batch_size=4",
        "running.audio.max_len=100",
        f"running.audio.norms=[{NORMS[0]}, {NORMS[1]}]",
        "running.audio.ship_bf16=True",
        "running.prompt=",
        "model.text.width=32", "model.text.heads=4",
        "model.text.encoder.layers=2",
        "num_proc=2",
        *extra,
    ])


@pytest.fixture(scope="module")
def at_pak_root(tmp_path_factory):
    from data_synth import make_synth_clotho
    from vipant_tpu.data.packed import pack_audio_text

    root = str(tmp_path_factory.mktemp("atpak"))
    make_synth_clotho(root, "clotho_dev", n=6, seconds=1.05)
    cfg = _at_cfg(root)
    out = pack_audio_text(cfg.running, cfg.model, "clotho_dev", pack_len=120)
    assert out.endswith("pak_clotho_dev.pak")
    return root


def test_at_pack_eval_matches_src(at_pak_root):
    """Eval-mode pak batches equal the per-item AT dataset's collated
    batches cast to bf16 (same fbank, same caption flattening)."""
    import ml_dtypes

    from vipant_tpu.data import build_audio_text_dataloader
    from vipant_tpu.data.packed import AudioTextDatasetPak

    cfg = _at_cfg(at_pak_root, ["running.audio.transform_fbank=False"])
    pak_loader = build_audio_text_dataloader(cfg, "pak_clotho_dev", False)
    src_loader = build_audio_text_dataloader(cfg, "clotho_dev", False)
    assert hasattr(pak_loader.dataset, "get_batch")
    assert isinstance(pak_loader.dataset, AudioTextDatasetPak)
    for pb, sb in zip(pak_loader, src_loader):
        assert pb["name"] == sb["name"]
        assert pb["audio"].dtype == np.dtype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(pb["audio"], np.float32),
            np.asarray(sb["audio"], np.float32).astype(ml_dtypes.bfloat16).astype(np.float32),
        )
        np.testing.assert_array_equal(pb["text"], sb["text"])  # [B*k, ctx]


def test_at_pack_train_caption_pick_seeded(at_pak_root):
    """Train batches pick one of k captions per item, deterministically
    under a batch seed; every picked row is one of the packed captions."""
    from vipant_tpu.data.packed import AudioTextDatasetPak

    cfg = _at_cfg(at_pak_root)
    ds = AudioTextDatasetPak(cfg.running, "pak_clotho_dev", train=True)
    b1 = ds.get_batch([0, 1, 2, 3], seed=7)
    b2 = ds.get_batch([0, 1, 2, 3], seed=7)
    np.testing.assert_array_equal(b1["text"], b2["text"])
    np.testing.assert_array_equal(
        np.asarray(b1["audio"], np.float32), np.asarray(b2["audio"], np.float32)
    )
    assert b1["text"].shape == (4, 77)
    for k, i in enumerate([0, 1, 2, 3]):
        packed = np.asarray(ds.text[i])
        assert any(np.array_equal(b1["text"][k], row) for row in packed)
    # a different seed eventually picks differently (k=5 distinct captions)
    picks = {ds.get_batch([0], seed=s)["text"].tobytes() for s in range(12)}
    assert len(picks) > 1


def test_at_pak_trainer_epoch_with_grad_cache(at_pak_root, tmp_path):
    """The AT fine-tune (the GC flagship) trains an epoch off the pak
    split with gradient cache on — the exact workload VERDICT r4 #6 calls
    out as missing the fast path."""
    from vipant_tpu.train import build_monitor

    cfg = _at_cfg(at_pak_root, [
        "+model/loss=ce", "+optimizer=standard",
        "model.image.width=64", "model.image.embed_dim=32",
        "model.image.encoder.layers=2", "model.image.heads=4",
        "model.audio.pre_encoder.stride=[16,24]",
        "optimizer.use_lars=False", "optimizer.warmup=False",
        "verbose=False", "mesh.data=1", "worker=CLAP", "monitor=LAMonitor",
        "running.data_name=pak_clotho_dev", "running.eval_name=",
        "running.test_name=",
        "running.grad_cache.alive=True", "running.grad_cache.chunk_size=2",
        "running.epochs=1", "running.peep_rate=1",
        "running.save_rate=1000000", "running.save_epoch=False",
        f"alias_root={tmp_path}/run", f"model_root={tmp_path}/run",
        "model_file=", "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.audio_bf16_fbank
    mon.epoch(0)
    assert mon.global_step == 1


def test_at_pack_ctx_mismatch_fails_loud(at_pak_root):
    from vipant_tpu.data import build_audio_text_dataloader

    cfg = _at_cfg(at_pak_root, ["model.text.ctx_len=16"])
    with pytest.raises(AssertionError, match="ctx_len"):
        build_audio_text_dataloader(cfg, "pak_clotho_dev", False)


# ---------------------------------------------------------------------------
# audioset packs (VERDICT r4 #6)
# ---------------------------------------------------------------------------


def _as_cfg(root, extra=()):
    return compose([
        "+running=audioset", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=transformer_val", "+running/audio=default",
        f"running.data_root={root}", "running.batch_size=4",
        "running.audio.max_len=100",
        f"running.audio.norms=[{NORMS[0]}, {NORMS[1]}]",
        "running.audio.ship_bf16=True",
        "running.image_uint8=True",
        "running.clf=True",
        "running.mixup_rate=0.0",
        "num_proc=2",
        *extra,
    ])


@pytest.fixture(scope="module")
def as_pak_root(tmp_path_factory):
    from data_synth import make_synth_audioset
    from vipant_tpu.data.audioset import build_audioset_label_map
    from vipant_tpu.data.packed import pack_audioset

    root = str(tmp_path_factory.mktemp("aspak"))
    make_synth_audioset(root, "as_train", n=6, seconds=1.05)
    cfg = _as_cfg(root)
    label_map = build_audioset_label_map(cfg.running)
    out = pack_audioset(cfg.running, "as_train", label_map, pack_len=120)
    assert out.endswith("pak_as_train.pak")
    return root


def test_as_pack_eval_matches_src(as_pak_root):
    """Eval pak batches equal the per-item AudioSet clf dataset's batches
    (audio bf16-cast, uint8 image crops, multi-hot labels)."""
    import ml_dtypes

    from vipant_tpu.data import build_audioset_dataloader

    cfg = _as_cfg(as_pak_root, ["running.audio.transform_fbank=False"])
    pak_loader = build_audioset_dataloader(cfg, "pak_as_train", False)
    src_loader = build_audioset_dataloader(cfg, "as_train", False)
    n = 0
    for pb, sb in zip(pak_loader, src_loader):
        assert pb["name"] == sb["name"]
        np.testing.assert_array_equal(pb["label"], sb["label"])
        np.testing.assert_array_equal(pb["image"], sb["image"])
        np.testing.assert_array_equal(
            np.asarray(pb["audio"], np.float32),
            np.asarray(sb["audio"], np.float32).astype(ml_dtypes.bfloat16).astype(np.float32),
        )
        n += int(pb.get("_count", len(pb["name"])))
    assert n == 6


def test_as_pak_guards(as_pak_root):
    from vipant_tpu.data import build_audioset_dataloader
    from vipant_tpu.data.audioset import build_audioset_label_map
    from vipant_tpu.data.packed import AudiosetDatasetPak

    cfg = _as_cfg(as_pak_root, ["running.mixup_rate=0.5"])
    lm = build_audioset_label_map(cfg.running)
    with pytest.raises(ValueError, match="mixup"):
        AudiosetDatasetPak(cfg.running, "pak_as_train", train=True, label_map=lm)
    # contrastive recipes must not silently lose their caption picks
    cfg2 = _as_cfg(as_pak_root, ["running.clf=False"])
    with pytest.raises(ValueError, match="clf"):
        build_audioset_dataloader(cfg2, "pak_as_train", True)
    # permuted label map -> loud failure
    lm_perm = {k: ((1 - v[0]),) + tuple(v[1:]) for k, v in lm.items()}
    with pytest.raises(ValueError, match="label map"):
        AudiosetDatasetPak(cfg.running, "pak_as_train", train=False, label_map=lm_perm)


def test_as_pak_weighted_sampling_and_trainer(as_pak_root, tmp_path):
    from vipant_tpu.train import build_monitor

    cfg = _as_cfg(as_pak_root, [
        "+model/loss=bce", "+optimizer=standard",
        "model.image.width=64", "model.image.embed_dim=32",
        "model.image.encoder.layers=2", "model.image.heads=4",
        "model.audio.pre_encoder.stride=[16,24]",
        "model.audio.freeze=False",
        "optimizer.use_lars=False", "optimizer.warmup=False",
        "verbose=False", "mesh.data=1",
        "worker=ASClassifier", "monitor=ASMonitor",
        "running.data_name=pak_as_train", "running.eval_name=",
        "running.test_name=",
        "running.weighted_sampling=True",
        "running.epochs=1", "running.peep_rate=1",
        "running.save_rate=1000000", "running.save_epoch=False",
        f"alias_root={tmp_path}/run", f"model_root={tmp_path}/run",
        "model_file=", "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.loader.sample_weights is not None
    mon.epoch(0)
    assert mon.global_step == 1


def test_at_pak_prompt_mismatch_fails_loud(at_pak_root):
    """The prompt is baked into the packed caption tokens at pack time —
    loading with a different ``running.prompt`` must refuse (the model
    would otherwise silently see different text than the config states)."""
    from vipant_tpu.data.packed import AudioTextDatasetPak

    cfg = _at_cfg(at_pak_root, ["running.prompt=the sound of "])
    with pytest.raises(ValueError, match="prompt"):
        AudioTextDatasetPak(cfg.running, "pak_clotho_dev", train=False)


def test_at_pak_np_rnd_permutes_captions(at_pak_root):
    """``running.np_rnd`` (random-caption baseline) permutes caption rows
    across clips on the pak path too: the served caption set is unchanged
    as a multiset but no longer aligned to its own audio."""
    from vipant_tpu.data.packed import AudioTextDatasetPak

    base = AudioTextDatasetPak(_at_cfg(at_pak_root).running, "pak_clotho_dev", train=False)
    n = len(base)
    np.random.seed(3)  # src parity: np_rnd draws from global np.random
    cfg = _at_cfg(at_pak_root, ["running.np_rnd=True"])
    ds = AudioTextDatasetPak(cfg.running, "pak_clotho_dev", train=False)
    idxs = list(range(n))
    got = ds.get_batch(idxs)["text"].reshape(n, -1)
    ref = base.get_batch(idxs)["text"].reshape(n, -1)
    if np.array_equal(ds._cap_row, np.arange(n)):  # pragma: no cover
        pytest.skip("permutation happened to be identity")
    assert not np.array_equal(got, ref)
    assert sorted(r.tobytes() for r in got) == sorted(r.tobytes() for r in ref)
    # audio is NOT permuted — only the caption alignment
    np.testing.assert_array_equal(
        np.asarray(ds.get_batch(idxs)["audio"], np.float32),
        np.asarray(base.get_batch(idxs)["audio"], np.float32),
    )


def test_at_pak_caption_pick_uniform_over_real_caps(at_pak_root):
    """Train picks are uniform over each clip's REAL captions (n_caps.npy),
    not over the k cyclically-padded slots — a 2-caption clip in a k=5 pack
    must only ever serve captions 0 and 1."""
    import os

    from vipant_tpu.data.packed import AudioTextDatasetPak

    cfg = _at_cfg(at_pak_root)
    pak_dir = os.path.join(at_pak_root, "pak_clotho_dev.pak")
    nc_path = os.path.join(pak_dir, "n_caps.npy")
    orig = np.load(nc_path)
    assert (orig == 5).all()  # clotho: 5 real captions per clip
    try:
        hacked = orig.copy()
        hacked[0] = 2  # pretend clip 0 has two real captions
        np.save(nc_path, hacked)
        ds = AudioTextDatasetPak(cfg.running, "pak_clotho_dev", train=True)
        packed = np.asarray(ds.text[0])
        seen = set()
        for s in range(40):
            row = ds.get_batch([0], seed=s)["text"][0]
            slot = next(
                j for j in range(packed.shape[0]) if np.array_equal(row, packed[j])
            )
            seen.add(slot)
        assert seen <= {0, 1}, f"picked padded slots: {sorted(seen)}"
        assert seen == {0, 1}, "40 seeded picks never hit both real captions"
    finally:
        np.save(nc_path, orig)


def test_as_pak_filter_set(as_pak_root):
    """``running.filter_set`` applies on the packed AudioSet path exactly
    like the src path's AudiosetSrc id filter."""
    import os

    from vipant_tpu.data import build_audioset_dataloader

    keep = ["y0", "y2", "y5"]
    with open(os.path.join(as_pak_root, "filt.csv"), "w") as f:
        f.write("\n".join(keep) + "\n")
    cfg = _as_cfg(as_pak_root, ["running.filter_set=filt.csv", "running.batch_size=3"])
    loader = build_audioset_dataloader(cfg, "pak_as_train", True)
    ds = loader.dataset
    assert sorted(ds.names[r] for r in ds.records) == keep
    (batch,) = list(loader)
    assert sorted(batch["name"]) == keep
