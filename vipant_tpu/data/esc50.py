"""X-fold classification datasets: ESC-50 (5-fold), UrbanSound8K (10-fold),
AudioSet eval, VoxCeleb2 — plus zero-shot label maps.

Parity with `/root/reference/cvap/data/esc50.py`: fold splits from the
standard metadata CSVs, per-class prompt texts ("the sound of …") BPE-ready
for zero-shot, and the ``build_xfold_dataloader_list`` dispatcher
(`:448-458`).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..tokenizer import tokenize
from .image_audio import fbank_params_from_cfg
from .indexfile import load_csv, load_jsonl
from .loader import DataLoader
from .transforms_audio import extract_fbank_features, make_transform


class AudioLabelDataset:
    """wav + integer label items
    (parity: `/root/reference/cvap/data/esc50.py:28-111`)."""

    def __init__(self, cfg, records: List[Dict], train: bool):
        self.cfg = cfg
        self.records = records
        self.train = train
        acfg = cfg.audio
        self.acfg = acfg
        self.params = fbank_params_from_cfg(acfg)
        self.norms = tuple(acfg.get("norms", []) or []) or None
        self.transform_audio, self.transform_fbank = make_transform(acfg)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, index: int) -> Dict:
        rec = self.records[index]
        audio = extract_fbank_features(
            rec["path"],
            self.params,
            max_audio_len=int(self.cfg.max_audio_len),
            train=self.train,
            zero_mean_wf=bool(self.acfg.get("zero_mean_wf", True)),
            tile_audio=bool(self.acfg.get("tile_audio", True)),
            transform_audio=self.transform_audio if self.train else None,
            norms=self.norms,
            transform_fbank=self.transform_fbank if self.train else None,
        )
        return {"audio": audio, "label": int(rec["label"]), "name": rec["id"]}


class AudioLabelCollator:
    def __call__(self, items: List[Dict]) -> Dict[str, np.ndarray]:
        return {
            "audio": np.stack([it["audio"] for it in items]).astype(np.float32)[:, None],
            "label": np.asarray([it["label"] for it in items], np.int32),
            "name": [it["name"] for it in items],
        }


def _label_texts(classes: List[str], prompt: str) -> Tuple[List[str], np.ndarray]:
    """One prompt text per class, tokenized to [C, 77]. Class names with
    underscores become spaces (US8K/ESC conventions)."""
    texts = [f"{prompt}{c.replace('_', ' ')}".strip() for c in classes]
    return texts, tokenize(texts)


def build_esc50_folds(cfg, data_name: str = "esc50"):
    """5-fold ESC-50 from the standard meta CSV (filename, fold, target,
    category) (parity: `/root/reference/cvap/data/esc50.py:224-276`).
    Returns (folds, classes, label_ids) where folds[i] =
    (train_records, eval_records) holding fold i+1 out."""
    meta = load_csv(os.path.join(cfg.data_root, f"{data_name}.csv"))
    classes: Dict[int, str] = {}
    records = []
    for row in meta:
        target = int(row["target"])
        classes[target] = row["category"]
        records.append(
            {
                "id": row["filename"].rsplit(".", 1)[0],
                "path": os.path.join(cfg.data_root, "audio", row["filename"]),
                "label": target,
                "fold": int(row["fold"]),
            }
        )
    class_list = [classes[i] for i in sorted(classes)]
    prompt = str(cfg.get("prompt", "") or "")
    texts, label_ids = _label_texts(class_list, prompt)
    nfold = max(r["fold"] for r in records)
    folds = []
    for f in range(1, nfold + 1):
        train = [r for r in records if r["fold"] != f]
        evals = [r for r in records if r["fold"] == f]
        folds.append((train, evals))
    return folds, class_list, label_ids


def build_us8k_folds(cfg, data_name: str = "us8k"):
    """UrbanSound8K 10-fold from UrbanSound8K.csv (slice_file_name, fold,
    classID, class) (parity: `/root/reference/cvap/data/esc50.py:278-324`)."""
    meta = load_csv(os.path.join(cfg.data_root, f"{data_name}.csv"))
    classes: Dict[int, str] = {}
    records = []
    for row in meta:
        cid = int(row["classID"])
        classes[cid] = row["class"]
        fold = int(row["fold"])
        records.append(
            {
                "id": row["slice_file_name"].rsplit(".", 1)[0],
                "path": os.path.join(cfg.data_root, "audio", f"fold{fold}", row["slice_file_name"]),
                "label": cid,
                "fold": fold,
            }
        )
    class_list = [classes[i] for i in sorted(classes)]
    prompt = str(cfg.get("prompt", "") or "")
    texts, label_ids = _label_texts(class_list, prompt)
    nfold = max(r["fold"] for r in records)
    folds = [
        (
            [r for r in records if r["fold"] != f],
            [r for r in records if r["fold"] == f],
        )
        for f in range(1, nfold + 1)
    ]
    return folds, class_list, label_ids


def build_jsonl_eval_fold(cfg, data_name: str):
    """Single-fold eval set from a JSONL index with ``label`` (int) and
    ``classes`` resolved externally — covers the AudioSet-eval and
    VoxCeleb2 paths (parity: `/root/reference/cvap/data/esc50.py:326-446`)."""
    rows = load_jsonl(os.path.join(cfg.data_root, f"{data_name}.jsonl"))
    classes = sorted({r["class"] for r in rows})
    cls_to_int = {c: i for i, c in enumerate(classes)}
    records = [
        {
            "id": r["id"],
            "path": os.path.join(cfg.data_root, r.get("dir", ""), "aclip", r.get("aclip", f"{r['id']}.wav")),
            "label": cls_to_int[r["class"]],
            "fold": 1,
        }
        for r in rows
    ]
    prompt = str(cfg.get("prompt", "") or "")
    texts, label_ids = _label_texts(classes, prompt)
    return [([], records)], classes, label_ids


def build_xfold_dataloader_list(
    cfg, data_name: Optional[str] = None, num_workers: Optional[int] = None
):
    """Dispatch by name → list of (train_loader, eval_loader) per fold,
    plus (classes, tokenized label prompts)
    (parity: `/root/reference/cvap/data/esc50.py:448-458`)."""
    run = cfg.running
    data_name = data_name or run.data_name
    if data_name.startswith("esc"):
        folds, classes, label_ids = build_esc50_folds(run, data_name)
    elif data_name.startswith("us8k"):
        folds, classes, label_ids = build_us8k_folds(run, data_name)
    else:
        folds, classes, label_ids = build_jsonl_eval_fold(run, data_name)

    loaders = []
    collate = AudioLabelCollator()
    for train_recs, eval_recs in folds:
        mk = lambda recs, train: (
            DataLoader(
                AudioLabelDataset(run, recs, train),
                batch_size=int(run.batch_size),
                collate_fn=collate,
                shuffle=train,
                drop_last=train,
                num_workers=num_workers or int(cfg.get("num_proc", 4)),
                seed=int(cfg.get("seed", 0)),
            )
            if recs
            else None
        )
        loaders.append((mk(train_recs, True), mk(eval_recs, False)))
    return loaders, classes, label_ids
