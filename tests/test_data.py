import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.data import (
    build_audio_text_dataloader,
    build_audioset_dataloader,
    build_audioset_label_map,
    build_image_audio_dataloader,
    build_xfold_dataloader_list,
    read_wav,
    write_wav,
)
from data_synth import (
    make_synth_audioset,
    make_synth_clotho,
    make_synth_esc50,
    make_synth_va_index,
    make_synth_va_npz_index,
)


def base_cfg(root, extra=()):
    return compose([
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=transformer_val",
        "+running/audio=default",
        f"running.data_root={root}",
        "running.batch_size=4",
        "running.audio.max_len=100",
        "num_proc=2",
        *extra,
    ])


def test_wav_roundtrip(tmp_path, rng):
    wav = (0.5 * rng.standard_normal(8000)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, 16000)
    back, sr = read_wav(path)
    assert sr == 16000
    assert back.shape == (1, 8000)
    assert np.max(np.abs(back[0] - np.clip(wav, -1, 1))) < 1e-3


def test_va_dataloader(tmp_path):
    make_synth_va_index(str(tmp_path), "train", n=6, seconds=1.05)
    cfg = base_cfg(str(tmp_path))
    loader = build_image_audio_dataloader(cfg, "train", train=True)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 3, 224, 224)
    assert batch["audio"].shape == (4, 1, 100, 128)
    assert len(batch["name"]) == 4


def test_va_dataloader_host_sharding(tmp_path):
    make_synth_va_index(str(tmp_path), "train", n=8, seconds=1.05)
    cfg = base_cfg(str(tmp_path))
    l0 = build_image_audio_dataloader(cfg, "train", train=True, process_id=0, num_processes=2)
    l1 = build_image_audio_dataloader(cfg, "train", train=True, process_id=1, num_processes=2)
    ids0 = {r["id"] for r in l0.dataset.records}
    ids1 = {r["id"] for r in l1.dataset.records}
    assert not (ids0 & ids1)
    assert len(ids0 | ids1) == 8
    assert l0.batch_size == 2  # global batch divided


def test_va_dataloader_npz(tmp_path):
    """Precomputed-fbank npz path (name-prefix dispatch "npz", parity:
    `/root/reference/cvap/data/image_audio.py:27-88`): long features get
    cropped to max_len, short ones zero-padded."""
    make_synth_va_npz_index(str(tmp_path), "npz_train", n=6, frames=120)
    cfg = base_cfg(str(tmp_path))
    loader = build_image_audio_dataloader(cfg, "npz_train", train=True)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 3, 224, 224)
    assert batch["audio"].shape == (4, 1, 100, 128)

    make_synth_va_npz_index(str(tmp_path), "npz_short", n=4, frames=60)
    loader = build_image_audio_dataloader(cfg, "npz_short", train=False)
    batch = next(iter(loader))
    a = np.asarray(batch["audio"])
    assert a.shape[2] == 100 and np.all(a[:, :, 60:, :] == 0)


def test_audio_text_dataloader(tmp_path):
    make_synth_clotho(str(tmp_path), "clotho_dev", n=6, seconds=1.05)
    cfg = base_cfg(str(tmp_path), ["running.prompt=the sound of"])
    train_loader = build_audio_text_dataloader(cfg, "clotho_dev", train=True)
    batch = next(iter(train_loader))
    assert batch["audio"].shape == (4, 1, 100, 128)
    assert batch["text"].shape == (4, 77)
    assert batch["text"][0, 0] == 49406

    eval_loader = build_audio_text_dataloader(cfg, "clotho_dev", train=False)
    ebatch = next(iter(eval_loader))
    assert ebatch["text"].shape == (20, 77)  # 4 audios × 5 captions


def test_esc50_xfold(tmp_path):
    make_synth_esc50(str(tmp_path), seconds=1.05)
    cfg = base_cfg(str(tmp_path), ["running.prompt=the sound of ", "running.data_name=esc50"])
    loaders, classes, label_ids, extras = build_xfold_dataloader_list(cfg)
    assert extras.get("label_map") is None  # single-prompt: no collapse map
    assert len(loaders) == 2  # 2 folds in the synthetic meta
    assert classes == ["dog", "rain"]
    assert label_ids.shape == (2, 77)
    _, eval_loader = loaders[0]
    batch = next(iter(eval_loader))
    assert batch["audio"].shape[1:] == (1, 100, 128)
    assert set(np.asarray(batch["label"])) <= {0, 1}


def test_esc50_mreserve_path(tmp_path, monkeypatch):
    """The optional MERLOT-Reserve comparison plumbing (parity:
    `/root/reference/cvap/data/esc50.py:129-216`): without the optional
    `mreserve` package the item path fails loudly with the recorded
    decision; with one (faked here — the real package + TF weights are
    unfetchable in this container) the dataset injects the prompt text as
    a leading dummy segment and the collated batch carries a ragged video
    list + the reference's placeholder audio."""
    import sys
    import types

    from vipant_tpu.data.esc50 import MReserveDataset

    make_synth_esc50(str(tmp_path), seconds=1.05)
    cfg = base_cfg(str(tmp_path), [
        "running.prompt=the sound of ",
        "running.data_name=esc50",
        "running.text=This is a sound of.",
    ])

    with pytest.raises(ImportError, match="mreserve"):
        MReserveDataset(
            cfg.running, [{"path": "missing.wav", "label": 0, "id": "x"}], False
        )[0]

    fake = types.ModuleType("mreserve")
    pre = types.ModuleType("mreserve.preprocess")

    def video_to_segments(path, **kw):
        assert path.endswith(".wav")
        return [{"text": None, "idx": i} for i in range(3)]

    def preprocess_video(segments, output_grid_size=None, verbose=False):
        return {"n_seg": len(segments), "texts": [s.get("text") for s in segments]}

    pre.video_to_segments = video_to_segments
    pre.preprocess_video = preprocess_video
    fake.preprocess = pre
    monkeypatch.setitem(sys.modules, "mreserve", fake)
    monkeypatch.setitem(sys.modules, "mreserve.preprocess", pre)

    loaders, classes, _, _ = build_xfold_dataloader_list(cfg, mreserve=True)
    assert classes == ["dog", "rain"]
    _, eval_loader = loaders[0]
    batch = next(iter(eval_loader))
    videos = batch["video"]
    assert isinstance(videos, list) and len(videos) == len(batch["label"])
    assert videos[0]["n_seg"] == 4  # 3 segments + the injected prompt segment
    assert videos[0]["texts"][0] == "This is a sound of."
    assert batch["audio"].shape == (len(videos), 1, 1)  # ref placeholder


def test_audioset_dataloader_clf_and_labelmap(tmp_path):
    make_synth_audioset(str(tmp_path), "as_train", n=8, seconds=1.05)
    cfg = base_cfg(
        str(tmp_path),
        [
            "running.prompt=the sound of",
            "running.clf=True",
            "running.mixup_rate=1.0",
            "running.weighted_sampling=True",
            "running.label_map=ontology,eval_segments",
            "running.cat_label=False",
            "running.nper_label=-1",
            "running.filter_set=null",
        ],
    )
    label_map = build_audioset_label_map(cfg.running)
    assert len(label_map) == 2  # /m/unused is not in eval segments
    assert label_map["/m/dog"][1] == "the sound of dog"
    loader = build_audioset_dataloader(cfg, "as_train", train=True, label_map=label_map)
    batch = next(iter(loader))
    assert batch["audio"].shape == (4, 1, 100, 128)
    assert batch["label"].shape == (4, 2)
    assert batch["image"].shape == (4, 3, 224, 224)

    # contrastive (labels-as-text) mode
    cfg2 = base_cfg(
        str(tmp_path),
        [
            "running.prompt=the sound of",
            "running.clf=False",
            "running.mixup_rate=0.0",
            "running.weighted_sampling=False",
            "running.label_map=ontology,eval_segments",
            "running.cat_label=False",
            "running.nper_label=-1",
            "running.filter_set=null",
        ],
    )
    loader2 = build_audioset_dataloader(cfg2, "as_train", train=True, label_map=label_map)
    b2 = next(iter(loader2))
    assert b2["text"].shape == (4, 77)


def test_audioset_mixup_soft_labels(tmp_path):
    """Mixup labels must be λ-weighted SOFT targets (lam*y1 + (1-lam)*y2),
    matching `/root/reference/cvap/data/audioset_cls.py:399-400` — not a
    hard union — and the mixed waveform must be re-zero-meaned (`:397`)."""
    make_synth_audioset(str(tmp_path), "as_train", n=8, seconds=1.05)
    cfg = base_cfg(
        str(tmp_path),
        [
            "running.prompt=the sound of",
            "running.clf=True",
            "running.mixup_rate=1.0",
            "running.weighted_sampling=False",
            "running.label_map=ontology,eval_segments",
            "running.cat_label=False",
            "running.nper_label=-1",
            "running.filter_set=null",
        ],
    )
    label_map = build_audioset_label_map(cfg.running)
    loader = build_audioset_dataloader(cfg, "as_train", train=True, label_map=label_map)
    ds = loader.dataset

    # replicate _audio_clf's RNG consumption to pin the exact soft label
    np.random.seed(123)
    assert np.random.rand() < 1.0  # mixup gate
    j = int(np.random.randint(len(ds.records)))
    lam = float(np.random.beta(10.0, 10.0))
    y1 = ds._label_vector(ds.records[0])
    y2 = ds._label_vector(ds.records[j])
    expect = lam * y1 + (1.0 - lam) * y2

    np.random.seed(123)
    _, label = ds._audio_clf(0)
    np.testing.assert_allclose(label, expect, rtol=1e-6)
    if not np.array_equal(y1, y2):  # distinct classes -> fractional targets
        assert 0.0 < float(label.max()) < 1.0
    assert 0.0 < lam < 1.0


def test_process_worker_backend(tmp_path):
    """loader_backend=process must yield the same batches as threads (same
    order seed), with items decoded in spawned worker processes — the
    scalable analogue of the reference's num_proc DataLoader workers
    (`/root/reference/cvap/data/image_audio.py:366-374`)."""
    from data_synth import make_synth_va_index

    make_synth_va_index(str(tmp_path), "train", n=8, seconds=1.05)
    base = [
        "running.data_name=train",
        "running.audio.transform_audio=null",  # no random augs: exact equality
        "running.audio.transform_fbank=False",
    ]
    cfg_t = base_cfg(str(tmp_path), base + ["loader_backend=thread"])
    cfg_p = base_cfg(str(tmp_path), base + ["loader_backend=process", "num_proc=2"])
    lt = build_image_audio_dataloader(cfg_t, "train", False)
    lp = build_image_audio_dataloader(cfg_p, "train", False)
    try:
        bt = [b for b in lt]
        bp = [b for b in lp]
        assert len(bt) == len(bp) == 2
        for x, y in zip(bt, bp):
            assert x["name"] == y["name"]
            # fresh spawned interpreters may pick different BLAS threading
            # than the long-lived parent: identical math, reduction-order
            # float drift ~1e-5 relative on log-mel values spanning ±30
            np.testing.assert_allclose(x["audio"], y["audio"], rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(x["image"], y["image"], atol=1e-5)
        # second epoch reuses the persistent pool
        bp2 = [b for b in lp]
        assert [b["name"] for b in bp2] == [b["name"] for b in bp]
    finally:
        lp.shutdown()


@pytest.mark.slow  # compile-heavy; covered by faster siblings in the fast tier
def test_process_worker_reproducible_augmentations(tmp_path):
    """Process-backend augmentation streams are seeded PER ITEM (loader
    seed, epoch, position), so two identically-seeded runs produce
    identical augmented batches — reproducibility a shared thread-pool RNG
    cannot give."""
    from data_synth import make_synth_va_index

    make_synth_va_index(str(tmp_path), "train", n=8, seconds=1.05)
    over = [
        "running.data_name=train",
        "running.audio.transform_fbank=True",  # SpecAugment: uses np.random
        "loader_backend=process",
        "num_proc=2",
        "seed=7",
    ]
    la = build_image_audio_dataloader(base_cfg(str(tmp_path), over), "train", True)
    lb = build_image_audio_dataloader(base_cfg(str(tmp_path), over), "train", True)
    try:
        for ba, bb in zip(la, lb):
            assert ba["name"] == bb["name"]
            np.testing.assert_array_equal(ba["audio"], bb["audio"])
        # different epoch -> different masks (the seed really varies)
        la.set_epoch(1)
        lb.set_epoch(0)
        a1 = next(iter(la))
        b0 = next(iter(lb))
        assert not np.array_equal(a1["audio"], b0["audio"])
    finally:
        la.shutdown()
        lb.shutdown()


def test_fbank_views_reference_semantics():
    """FbankViews (siamese two-view audio) matches the reference's
    FbankTransform (`/root/reference/cvap/data/audio/transform.py:223-258`):
    hardcoded AudioSet normalization, per-view masks, sentinel gating."""
    from vipant_tpu.data.transforms_audio import (
        AUDIOSET_FBANK_MEAN,
        AUDIOSET_FBANK_STD,
        FbankViews,
    )

    fv = FbankViews()
    rng = np.random.default_rng(0)
    fb = rng.standard_normal((100, 128)).astype(np.float32) * 5.7 - 4.9
    want = (fb - AUDIOSET_FBANK_MEAN) / AUDIOSET_FBANK_STD

    # eval: normalize-only + sentinel
    y1, y2 = fv(fb, both=True, train=False)
    np.testing.assert_allclose(y1, want, rtol=1e-6)
    assert y2.shape == (1, 1, 1)

    # train, aa off: one masked view + sentinel
    np.random.seed(3)
    y1, y2 = fv(fb, both=False, train=True)
    assert y2.shape == (1, 1, 1)
    # every surviving (unmasked) entry is exactly the normalized value
    masked = y1 == 0.0
    np.testing.assert_allclose(y1[~masked], want[~masked], rtol=1e-6)
    assert masked.any()  # the masks really applied

    # train, aa on: two views from the SAME normalized base, different masks
    np.random.seed(3)
    y1, y2 = fv(fb, both=True, train=True)
    assert y2.shape == fb.shape
    m2 = y2 == 0.0
    np.testing.assert_allclose(y2[~m2], want[~m2], rtol=1e-6)


def test_siamese_dataset_view_gating(tmp_path):
    """The siamese dataset produces both audio views from ONE extraction and
    ships [1,1,1] sentinels for views whose loss flag is off (default
    ce_va: vv=True, aa=False), like the reference
    (`/root/reference/cvap/data/image_audio.py:256-305`)."""
    from data_synth import make_synth_va_index

    from vipant_tpu.data.image_audio import ImageAudioDatasetSiameseSrc

    make_synth_va_index(str(tmp_path), "train", n=4, seconds=1.05)
    cfg = base_cfg(str(tmp_path)).running

    ds = ImageAudioDatasetSiameseSrc(cfg, "train", True, loss_flags={"vv": True, "aa": False})
    item = ds[0]
    assert item["audio_v2"].shape == (1, 1, 1)  # aa off -> sentinel
    assert item["image_v2"].shape[0] == 3  # vv on -> real CHW view
    # audio_v1 is normalized (AudioSet stats): values nowhere near raw log-mel
    a1 = item["audio_v1"]
    assert abs(float(a1.mean())) < 3.0  # raw log-mel means sit near -5

    ds2 = ImageAudioDatasetSiameseSrc(cfg, "train", True, loss_flags={"vv": False, "aa": True})
    item2 = ds2[0]
    assert item2["image_v2"].shape == (1, 1, 1)  # vv off -> sentinel
    assert item2["audio_v2"].shape == item2["audio_v1"].shape  # aa on -> real

    # eval: deterministic single views + sentinels
    dse = ImageAudioDatasetSiameseSrc(cfg, "train", False, loss_flags={"vv": True, "aa": True})
    ie = dse[0]
    assert ie["audio_v2"].shape == (1, 1, 1) and ie["image_v2"].shape == (1, 1, 1)
    again = dse[0]
    np.testing.assert_array_equal(ie["image_v1"], again["image_v1"])
    np.testing.assert_array_equal(ie["audio_v1"], again["audio_v1"])


def test_authentic_clip_views_and_clip_tf_switch(tmp_path):
    """running.clip_tf selects the un-augmented CLIP two-view path
    (`/root/reference/cvap/data/image_audio.py:232-237` resolving to
    AuthenticCLIPImageTransform, `.../image/transform.py:73-96`)."""
    from data_synth import make_synth_va_index

    from vipant_tpu.data.image_audio import ImageAudioDatasetSiameseSrc
    from vipant_tpu.data.transforms_image import AuthenticImageViews, clip_preprocess
    from PIL import Image

    img = Image.fromarray((np.random.rand(64, 96, 3) * 255).astype(np.uint8))
    av = AuthenticImageViews(32)
    y1, y2 = av(img, both=True, train=True)
    want = clip_preprocess(img, 32)
    np.testing.assert_array_equal(y1, want)
    np.testing.assert_array_equal(y2, want)  # both views deterministic
    _, s = av(img, both=False, train=True)
    assert s.shape == (1, 1, 1)

    make_synth_va_index(str(tmp_path), "train", n=2, seconds=1.05)
    cfg = base_cfg(str(tmp_path), ["running.clip_tf=true"]).running
    ds = ImageAudioDatasetSiameseSrc(cfg, "train", True, loss_flags={"vv": True})
    assert isinstance(ds.two_view_image, AuthenticImageViews)
    item = ds[0]
    np.testing.assert_array_equal(item["image_v1"], item["image_v2"])


def test_print_label_dist_table():
    """Dependency-free analogue of the reference's tabulate table
    (`/root/reference/cvap/data/audioset_cls.py:39-58`)."""
    from vipant_tpu.data.audioset import print_label_dist

    lines = []
    msg = print_label_dist(
        lines.append,
        np.array([5.0, 2.0, 700.0]),
        {0: "dog", 1: "a very long category name", 2: "cat"},
        ncol=4,
    )
    assert lines and msg.count("|") > 6
    assert "dog" in msg and "cat" in msg and "700" in msg
    assert "a very long c.." in msg  # 15-char truncation
    assert "total 707" in msg


def test_build_filter_set_reference_formats(tmp_path):
    """The reference's three filter-file formats + "name,topk" spec
    (`/root/reference/cvap/data/audioset_hub.py:32-58`)."""
    import json
    from vipant_tpu.data import build_filter_set

    root = str(tmp_path)
    # csv: one sample id per line
    with open(tmp_path / "ids.csv", "w") as f:
        f.write("y0\ny1\n\n")
    assert build_filter_set("ids.csv", root) == {"y0", "y1"}
    # samples-per-label buckets: filename ends with "k"
    with open(tmp_path / "per_label_50k", "w") as f:
        json.dump({"/m/dog": ["a", "b"], "/m/rain": ["c"]}, f)
    assert build_filter_set("per_label_50k", root) == {"a", "b", "c"}
    # jsonl neighbor lists sliced by topk, keys kept
    with open(tmp_path / "sims.jsonl", "w") as f:
        f.write(json.dumps({"q0": [["n1", 0.9], ["n2", 0.8], ["n3", 0.7]]}) + "\n")
        f.write(json.dumps({"q1": [["m1", 0.5], ["m2", 0.4]]}) + "\n")
    assert build_filter_set("sims.jsonl,2", root) == {"q0", "n1", "n2", "q1", "m1", "m2"}
    # failures collapse to None like the reference's bare except
    assert build_filter_set(None) is None
    assert build_filter_set("missing.csv", root) is None
    assert build_filter_set("sims.jsonl,notanint", root) is None


def test_label_map_ontology_order(tmp_path):
    """Class indices follow ontology order, not lexicographic order
    (`/root/reference/cvap/data/audioset_hub.py:84-103`)."""
    import json

    # rain precedes dog in the ontology although "/m/dog" sorts first
    with open(tmp_path / "ontology.json", "w") as f:
        json.dump(
            [
                {"id": "/m/rain", "name": "Rain"},
                {"id": "/m/unused", "name": "Unused"},
                {"id": "/m/dog", "name": "Dog"},
            ],
            f,
        )
    with open(tmp_path / "eval_segments.csv", "w") as f:
        f.write("# h\n# h\n")
        f.write('y0, 0.0, 1.0, "/m/dog"\n')
        f.write('y1, 0.0, 1.0, "/m/rain"\n')
    cfg = base_cfg(str(tmp_path), ["running.label_map=ontology,eval_segments"])
    label_map = build_audioset_label_map(cfg.running)
    assert label_map["/m/rain"][0] == 0
    assert label_map["/m/dog"][0] == 1
    assert "/m/unused" not in label_map


def test_audioset_filter_set_through_dataloader(tmp_path):
    make_synth_audioset(str(tmp_path), "as_train", n=8, seconds=1.05)
    with open(tmp_path / "keep.csv", "w") as f:
        f.write("y0\ny2\ny4\n")
    cfg = base_cfg(
        str(tmp_path),
        [
            "running.prompt=the sound of",
            "running.clf=True",
            "running.label_map=ontology,eval_segments",
            "running.filter_set=keep.csv",
        ],
    )
    loader = build_audioset_dataloader(cfg, "as_train", train=True)
    assert {r["id"] for r in loader.dataset.records} == {"y0", "y2", "y4"}


def test_esc50_mreserve_eval_samples_truncation(tmp_path):
    """The mreserve comparison path stops eval at ``running.eval_samples``
    (parity: `/root/reference/cvap/data/esc50.py:136-137` — the per-item
    video segmentation is expensive); the plain ESC x-fold protocol keeps
    evaluating full folds."""
    from vipant_tpu.data.esc50 import build_xfold_dataloader_list

    make_synth_esc50(str(tmp_path), seconds=1.05)
    cfg = base_cfg(str(tmp_path), [
        "running.prompt=the sound of ",
        "running.data_name=esc50",
        "running.eval_samples=2",
    ])
    plain, _, _, _ = build_xfold_dataloader_list(cfg, "esc50")
    mres, _, _, _ = build_xfold_dataloader_list(cfg, "esc50", mreserve=True)
    assert [len(ev.dataset) for _, ev in plain] == [4, 4]  # full folds
    assert [len(ev.dataset) for _, ev in mres] == [2, 2]  # truncated
