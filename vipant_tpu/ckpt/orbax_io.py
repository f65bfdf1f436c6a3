"""Native checkpointing via Orbax.

Save layout parity with the reference's ``{step:08d}.pth`` convention
(`/root/reference/cvap/monitor/cvap.py:274-281`) but with full train state
(params + optimizer + step + rng), fixing the reference's
no-resume-of-optimizer gap (SURVEY.md §5). The config snapshot is stored
alongside, so checkpoints are config-versioned like the reference's
(`/root/reference/cvap/model/helper.py:18-21`).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config


def save_checkpoint(
    ckpt_dir: str, step: int, state, cfg=None, model_only=None, keep_last: int = 0
) -> str:
    """Writes ``{ckpt_dir}/{step:08d}/`` with the pytree state (+ cfg json).

    ``model_only``: optional params subtree dict (e.g. audio+loss heads) for
    reference-style weight-only exports
    (`/root/reference/cvap/model/cvap.py:42-46` collect_audio_state_dict).
    ``keep_last``: when > 0, older step directories beyond the newest N are
    pruned after a successful save.
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:08d}")
    if os.path.exists(path):  # re-saving a step (resume) overwrites it
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    ckptr = ocp.StandardCheckpointer()
    payload = jax.device_get(state)
    ckptr.save(os.path.join(path, "state"), payload)
    ckptr.wait_until_finished()
    if cfg is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(cfg.to_dict(resolve=False) if isinstance(cfg, Config) else cfg, f)
    if model_only is not None:
        np.savez(
            os.path.join(path, "model.npz"),
            **{k: v for k, v in _flatten("", model_only)},
        )
    if keep_last > 0:
        import shutil

        steps = sorted(
            d for d in os.listdir(os.path.abspath(ckpt_dir)) if re.fullmatch(r"\d{8}", d)
        )
        # keep the newest N by step number, but never delete the checkpoint
        # just written (a resume from an earlier step saves a lower number
        # than stale later ones)
        for old in steps[:-keep_last]:
            if old == f"{step:08d}":
                continue
            shutil.rmtree(os.path.join(os.path.abspath(ckpt_dir), old), ignore_errors=True)
    return path


def load_checkpoint(path: str, abstract_state) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`; ``abstract_state``
    is a matching pytree of shapes/arrays (e.g. a freshly-created state)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), "state"), abstract_state)


def load_checkpoint_config(path: str) -> Optional[Config]:
    p = os.path.join(path, "config.json")
    if os.path.exists(p):
        with open(p) as f:
            return Config(json.load(f))
    return None


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if re.fullmatch(r"\d{8}", d)]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps))


def extract_model_files(log_path: str) -> list:
    """Scrape checkpoint paths from a training log — the reference's
    "repeated eval" mechanism where the log doubles as a checkpoint manifest
    (`/root/reference/cvap/model/helper.py:65-77`)."""
    out = []
    pat = re.compile(r"saving the checkpoint to (\S+)")
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                out.append(m.group(1))
    return out


def _flatten(prefix: str, tree) -> list:
    items = []
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            items.extend(_flatten(key + ".", v))
        else:
            items.append((key, np.asarray(v)))
    return items
