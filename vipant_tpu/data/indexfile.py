"""Index-file handling: every dataset is a JSONL/CSV index of records
``{id, dir, aclip, frame, labels/captions}`` with media at
``{data_root}/{dir}/{aclip|frame_key}/{id}.{ext}``
(convention: `/root/reference/cvap/data/image_audio.py:131-151`).

Host sharding: each process takes a strided slice of the index — the SPMD
analogue of ``DistributedSampler``
(`/root/reference/cvap/data/image_audio.py:354-360`).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def load_jsonl(path: str, fraction: float = 1.0, limit: Optional[int] = None) -> List[Dict]:
    records: List[Dict] = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    if fraction < 1.0:
        records = records[: int(len(records) * fraction)]
    if limit is not None and limit > 0:
        records = records[:limit]
    return records


def load_csv(path: str, delimiter: str = ",") -> List[Dict]:
    with open(path, "r", newline="") as f:
        return list(csv.DictReader(f, delimiter=delimiter))


def resolve_media_path(
    data_root: str, record: Dict[str, Any], kind: str, ext: Optional[str] = None
) -> str:
    """kind: "aclip" (audio) or a frame key; the record stores the relative
    file name in that field."""
    name = record.get(kind) or f"{record['id']}.{ext or 'wav'}"
    return os.path.join(data_root, str(record.get("dir", "")), kind, name)


def shard_for_host(records: List, process_id: int, num_processes: int) -> List:
    """Equal-length per-host shards (DistributedSampler-style wrap padding,
    `/root/reference/cvap/data/image_audio.py:354-360`): a ragged split
    would give hosts different batch counts — one host exits the epoch loop
    while another blocks inside the SPMD step collective — and per-host
    ``steps_per_epoch`` (warmup milestones, mid-epoch resume divmod) would
    disagree. Eval shards share the standard DistributedSampler caveat: up
    to ``num_processes - 1`` wrapped duplicates when N is not divisible."""
    if num_processes <= 1:
        return records
    if not records:
        return []
    need = -(-len(records) // num_processes) * num_processes  # ceil * n
    padded = list(records)
    while len(padded) < need:  # loop: N may be < num_processes
        padded.extend(records[: need - len(padded)])
    return padded[process_id::num_processes]


def eval_sample_limit(value) -> Optional[int]:
    """``running.eval_samples`` → record cap. unset/0/negative/inf mean
    "evaluate everything" (Trainer._samples_cap blesses inf), so they map
    to None instead of crashing ``int(float('inf'))``."""
    try:
        f = float(value if value is not None else 0)
    except (TypeError, ValueError):
        return None
    if not np.isfinite(f) or f <= 0:
        return None
    return int(f)


def epoch_permutation(n: int, epoch: int, seed: int) -> np.ndarray:
    """Deterministic per-epoch shuffle (the ``sampler.set_epoch`` analogue,
    `/root/reference/cvap/monitor/cvap.py:106-111`)."""
    rng = np.random.default_rng(seed + epoch)
    return rng.permutation(n)
