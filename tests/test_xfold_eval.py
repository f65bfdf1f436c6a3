"""Dedicated AudioSet / VoxCeleb2 x-fold eval builders and multi-prompt
zero-shot label maps (parity: `/root/reference/cvap/data/esc50.py:258-446`,
`/root/reference/cvap/module/decoder/loss_head.py:365-407`)."""

import json
import os

import numpy as np

from data_synth import make_synth_audioset_eval, make_synth_esc50, make_synth_voxceleb2
from vipant_tpu.config import compose
from vipant_tpu.data import build_xfold_dataloader_list
from vipant_tpu.eval.metrics import zero_shot_classification

from test_trainers import TINY_MODEL


def base_cfg(root, extra=()):
    return compose([
        "+running=esc50",
        *TINY_MODEL,
        "+model/loss=ce_cls",
        "worker=ESClassifier",
        f"running.data_root={root}",
        "running.batch_size=4",
        *extra,
    ])


def test_audioset_eval_builder_multihot(tmp_path):
    make_synth_audioset_eval(str(tmp_path), "audioset", n=6, seconds=1.05)
    cfg = base_cfg(str(tmp_path), ["running.data_name=audioset", "running.eval_name=audioset",
                                   "running.prompt=the sound of"])
    loaders, classes, label_ids, extras = build_xfold_dataloader_list(cfg)
    assert len(loaders) == 1
    train_loader, eval_loader = loaders[0]
    assert train_loader is None  # eval-only set
    assert classes == ["the sound of dog", "the sound of rain"]
    assert label_ids.shape == (2, 77)
    batch = next(iter(eval_loader))
    assert batch["label"].shape == (4, 2)  # multi-hot
    # record z2 has both labels
    i = batch["name"].index("z2") if "z2" in batch["name"] else None
    if i is not None:
        assert batch["label"][i].sum() == 2


def test_multihot_zero_shot_top1_in_gold():
    audio = np.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.1]])
    text = np.eye(2)
    labels = np.asarray([[1, 0], [1, 0], [1, 1]])  # gold sets
    p1 = zero_shot_classification(audio, text, labels)
    # preds: 0 (in gold), 1 (NOT in gold), 0 (in gold) -> 2/3
    assert abs(p1 - 200.0 / 3.0) < 1e-6


def test_voxceleb2_builder(tmp_path):
    make_synth_voxceleb2(str(tmp_path), n_speakers=3, n_vids=2, n_clips=3, seconds=1.05)
    cfg = base_cfg(str(tmp_path), [
        "running.data_name=voxceleb2",
        "running.nsample_per_vid=2",
        "running.prompt=a recording of",
    ])
    loaders, classes, label_ids, extras = build_xfold_dataloader_list(cfg)
    (train_loader, eval_loader), = loaders
    assert train_loader is None
    assert classes == ["speaker_0", "speaker_1", "speaker_2"]  # dev row skipped
    assert label_ids.shape == (3, 77)
    faces = extras["faces"]
    assert set(faces) == {0, 1, 2}
    assert faces[1].endswith("vggface2/test/n000001/0001.jpg")
    # one list row per vox_id; nsample_per_vid=2 samples 2 of the 6 clips
    # per row (reference samples per row: esc50.py:383-391) -> 3 x 2 = 6
    assert sum(len(b["label"][: b.get("_count", len(b["label"]))]) for b in eval_loader) == 6


def test_esc50_multiprompt_label_map(tmp_path):
    make_synth_esc50(str(tmp_path), seconds=1.05)
    os.makedirs(os.path.join(str(tmp_path), "meta"), exist_ok=True)
    # the reference's prompt-rewrite file: class name -> prompt variants
    with open(os.path.join(str(tmp_path), "meta", "prompts4.json"), "w") as f:
        json.dump({
            "dog": ["a photo of a dog", "a dog barking", "the bark of a dog", "canine sounds"],
            "rain": ["a photo of rain", "rain falling", "the sound of rainfall", "water drops"],
        }, f)
    cfg = base_cfg(str(tmp_path), ["running.data_name=esc50", "running.prompt=prompts4"])
    loaders, classes, label_ids, extras = build_xfold_dataloader_list(cfg)
    label_map = extras["label_map"]
    assert label_ids.shape == (8, 77)  # 2 classes x 4 prompts
    assert label_map == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1, 7: 1}
    # "a photo of" rewritten to "the sound of" in rows 0 and 4
    from vipant_tpu.tokenizer import tokenize

    want = tokenize(["the sound of a dog"])[0]
    np.testing.assert_array_equal(label_ids[0], want)

    # collapse semantics: prompt-row argmax maps back to the class id
    audio = np.asarray([[0, 0, 0, 1.0, 0, 0, 0, 0.2]])  # row 3 -> class 0
    text = np.eye(8)
    assert zero_shot_classification(audio, text, np.asarray([0]), label_map=label_map) == 100.0


def test_esc_monitor_zero_shot_e2e_multiprompt(tmp_path):
    """Full ESCMonitor zero-shot pass with a multi-prompt label map."""
    from vipant_tpu.train import build_monitor

    make_synth_esc50(str(tmp_path), seconds=1.05)
    os.makedirs(os.path.join(str(tmp_path), "meta"), exist_ok=True)
    with open(os.path.join(str(tmp_path), "meta", "p.json"), "w") as f:
        json.dump({
            "dog": ["a photo of a dog", "a dog", "dog sound", "barking"],
            "rain": ["a photo of rain", "rain", "rain sound", "rainfall"],
        }, f)
    cfg = compose([
        "+running=esc50",
        *TINY_MODEL,
        "+model/loss=ce_cls",
        "worker=ESClassifier",
        "monitor=ESCMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=esc50",
        "running.batch_size=4",
        "running.prompt=p",
        "running.zero_shot=True",
        "running.epochs=1",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=True",
    ])
    mon = build_monitor(cfg)
    p1 = mon.learn()
    assert 0.0 <= p1 <= 100.0
