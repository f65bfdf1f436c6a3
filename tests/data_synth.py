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


def make_synth_va_npz_index(root, name="npz_train", n=8, frames=120, mel=128):
    """VA dataset with precomputed-fbank npz audio (the reference's
    throughput path): {root}/aclip/*.npz under "feat" + frame jpgs."""
    os.makedirs(os.path.join(root, "aclip"), exist_ok=True)
    os.makedirs(os.path.join(root, "frame"), exist_ok=True)
    records = []
    rng = np.random.default_rng(0)
    for i in range(n):
        np.savez(
            os.path.join(root, "aclip", f"clip{i}.npz"),
            feat=rng.standard_normal((frames, mel)).astype(np.float32),
        )
        _jpg(os.path.join(root, "frame", f"clip{i}.0.jpg"), seed=i)
        records.append({"id": f"clip{i}", "dir": "", "aclip": ["npz"], "frame": ["0.jpg"]})
    with open(os.path.join(root, f"{name}.jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return records


def make_synth_clotho(root, name="clotho_dev", n=6, seconds=1.0, identical_caps=False):
    """``identical_caps``: all 5 caption slots carry the SAME string per
    clip — the captioning overfit test needs one deterministic gold string
    per audio (greedy decode must reproduce it exactly)."""
    os.makedirs(os.path.join(root, name, "aclip"), exist_ok=True)
    rows = ["file_name," + ",".join(f"caption_{i}" for i in range(1, 6))]
    for i in range(n):
        _tone_wav(os.path.join(root, name, "aclip", f"a{i}.wav"), seconds, freq=300 + 40 * i, seed=i)
        if identical_caps:
            caps = ",".join([f"sound number {i}"] * 5)
        else:
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


def make_synth_audioset_eval(root, name="audioset", n=6, seconds=1.0):
    """Dedicated AudioSet zero-shot eval format: ontology + eval_segments
    (for the label map) + a JSONL-lines `{name}.csv` index whose records
    carry multi-label `labels` lists."""
    make_synth_audioset(root, "unused_train", n=2, seconds=seconds)  # ontology+segments
    os.makedirs(os.path.join(root, "aclip"), exist_ok=True)
    with open(os.path.join(root, f"{name}.csv"), "w") as f:
        for i in range(n):
            _tone_wav(os.path.join(root, "aclip", f"z{i}.wav"), seconds, freq=260 + 45 * i, seed=i)
            labels = [["/m/dog"], ["/m/rain"], ["/m/dog", "/m/rain"]][i % 3]
            f.write(json.dumps({"id": f"z{i}", "dir": "", "aclip": ["wav"], "labels": labels}) + "\n")


def make_synth_voxceleb2(root, name="voxceleb2", n_speakers=3, n_vids=2, n_clips=3, seconds=1.0):
    """VoxCeleb2 eval format: `{name}.csv` (JSONL speaker/video rows with
    vggface2 face fields) + `{name}_list.csv` (JSONL vox_id -> [[file, sub]])
    + aac/{vox_id}/{sub}/{file} audio clips."""
    rows, lists = [], []
    for s in range(n_speakers):
        vox_id = f"id{s:05d}"
        clips = []
        for v in range(n_vids):
            sub = f"vid{v}"
            for c in range(n_clips):
                fname = f"{c:05d}.wav"
                d = os.path.join(root, "aac", vox_id, sub)
                os.makedirs(d, exist_ok=True)
                _tone_wav(os.path.join(d, fname), seconds, freq=250 + 37 * (s * 7 + v * 3 + c), seed=s * 100 + v * 10 + c)
                clips.append([fname, sub])
        lists.append({vox_id: clips})
        rows.append({
            "split": "test", "name": f"speaker_{s}", "vox_id": vox_id,
            "vgg_split": "test", "vgg_id": f"n{s:06d}", "face": "0001.jpg",
        })
    rows.append({  # a dev row the builder must skip
        "split": "dev", "name": "dev_speaker", "vox_id": "id99999",
        "vgg_split": "dev", "vgg_id": "n999999", "face": "0001.jpg",
    })
    with open(os.path.join(root, f"{name}.csv"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(root, f"{name}_list.csv"), "w") as f:
        for r in lists:
            f.write(json.dumps(r) + "\n")


def make_synth_audioset_captions(root, text_emb="capembs", n=8, embed_dim=32, as_text=False):
    """External captions for an AudioSet index: `caption/{text_emb}.csv`
    (json: id -> caption list). With ``as_text`` the captions are raw
    strings; otherwise they are caption ids with precomputed embeddings at
    `caption/{text_emb}/{cid}.npz`."""
    os.makedirs(os.path.join(root, "caption", text_emb), exist_ok=True)
    rng = np.random.default_rng(7)
    mapping = {}
    for i in range(n):
        if as_text:
            mapping[f"y{i}"] = [f"a recording of sound {i}", f"clip number {i}"]
        else:
            cids = [2 * i, 2 * i + 1]
            mapping[f"y{i}"] = cids
            for c in cids:
                np.savez(
                    os.path.join(root, "caption", text_emb, f"{c}.npz"),
                    v=rng.standard_normal(embed_dim).astype(np.float32),
                )
    with open(os.path.join(root, "caption", f"{text_emb}.csv"), "w") as f:
        json.dump(mapping, f)
