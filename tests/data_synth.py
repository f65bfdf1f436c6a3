"""Synthetic dataset fabrication for tests and CLI smoke runs — the
rebuild's analogue of the reference's toy index files (SURVEY.md §4)."""

import json
import os

import numpy as np
from PIL import Image

from vipant_tpu.data.wav import write_wav


def _tone_wav(path, seconds=1.0, sr=16000, freq=440.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    wav = 0.4 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(len(t))
    write_wav(path, wav.astype(np.float32), sr)


def _jpg(path, seed=0, size=64):
    rng = np.random.default_rng(seed)
    Image.fromarray((rng.random((size, size, 3)) * 255).astype(np.uint8)).save(path)


def make_synth_va_index(root, name="train", n=8, seconds=1.0):
    """VA dataset: {root}/aclip/*.wav, {root}/frame/*.jpg + {name}.jsonl."""
    os.makedirs(os.path.join(root, "aclip"), exist_ok=True)
    os.makedirs(os.path.join(root, "frame"), exist_ok=True)
    records = []
    for i in range(n):
        _tone_wav(os.path.join(root, "aclip", f"clip{i}.wav"), seconds, freq=300 + 50 * i, seed=i)
        _jpg(os.path.join(root, "frame", f"clip{i}.0.jpg"), seed=i)
        records.append({"id": f"clip{i}", "dir": "", "aclip": ["wav"], "frame": ["0.jpg"]})
    with open(os.path.join(root, f"{name}.jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return records


def make_synth_clotho(root, name="clotho_dev", n=6, seconds=1.0):
    os.makedirs(os.path.join(root, name, "aclip"), exist_ok=True)
    rows = ["file_name," + ",".join(f"caption_{i}" for i in range(1, 6))]
    for i in range(n):
        _tone_wav(os.path.join(root, name, "aclip", f"a{i}.wav"), seconds, freq=300 + 40 * i, seed=i)
        caps = ",".join(f"sound number {i} take {j}" for j in range(1, 6))
        rows.append(f"a{i}.wav,{caps}")
    with open(os.path.join(root, f"{name}.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


def make_synth_esc50(root, name="esc50", n_per_class=4, classes=("dog", "rain"), seconds=1.0):
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    rows = ["filename,fold,target,category"]
    k = 0
    for target, cat in enumerate(classes):
        for j in range(n_per_class):
            fname = f"{k}.wav"
            _tone_wav(os.path.join(root, "audio", fname), seconds, freq=250 + 200 * target, seed=k)
            fold = (j % 2) + 1
            rows.append(f"{fname},{fold},{target},{cat}")
            k += 1
    with open(os.path.join(root, f"{name}.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


def make_synth_audioset(root, name="as_train", n=8, seconds=1.0):
    os.makedirs(os.path.join(root, "aclip"), exist_ok=True)
    os.makedirs(os.path.join(root, "frame"), exist_ok=True)
    labels = ["/m/dog", "/m/rain"]
    ontology = [
        {"id": "/m/dog", "name": "Dog"},
        {"id": "/m/rain", "name": "Rain"},
        {"id": "/m/unused", "name": "Unused"},
    ]
    with open(os.path.join(root, "ontology.json"), "w") as f:
        json.dump(ontology, f)
    seg = ["# header1", "# header2"]
    records = []
    for i in range(n):
        lid = labels[i % 2]
        _tone_wav(os.path.join(root, "aclip", f"y{i}.wav"), seconds, freq=280 + 60 * i, seed=i)
        _jpg(os.path.join(root, "frame", f"y{i}.0.jpg"), seed=i)
        seg.append(f'y{i}, 0.0, {seconds}, "{lid}"')
        records.append(
            {"id": f"y{i}", "dir": "", "aclip": ["wav"], "frame": ["0.jpg"], "labels": [lid]}
        )
    with open(os.path.join(root, "eval_segments.csv"), "w") as f:
        f.write("\n".join(seg) + "\n")
    with open(os.path.join(root, f"{name}.jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
