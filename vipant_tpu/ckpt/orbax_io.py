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


def _barrier(tag: str) -> None:
    """Cross-process sync point (no-op single-host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def host_local_tree(tree) -> Any:
    """Materialize a (possibly globally-sharded) pytree as host numpy on
    EVERY process. Fully-addressable / fully-replicated arrays transfer
    directly; cross-process-sharded arrays are all-gathered (a collective —
    all processes must call this together)."""

    def to_host(x):
        if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.is_fully_replicated
        ):
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(jax.device_get(x))

    return jax.tree_util.tree_map(to_host, tree)


_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint save commits. Call at the
    end of training (and before reading a just-saved checkpoint)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    state,
    cfg=None,
    model_only=None,
    keep_last: int = 0,
    async_save: bool = False,
) -> str:
    """Writes ``{ckpt_dir}/{step:08d}/`` with the pytree state (+ cfg json).

    Multi-host correct: this is a COLLECTIVE — every process passes its
    (sharded) state and calls this together; Orbax writes each process's
    addressable shards and process 0 finalizes. Host-side extras (config
    json, npz export, retention pruning) run on process 0 only.

    ``model_only``: optional params subtree dict (e.g. audio+loss heads) for
    reference-style weight-only exports
    (`/root/reference/cvap/model/cvap.py:42-46` collect_audio_state_dict).
    ``keep_last``: when > 0, older step directories beyond the newest N are
    pruned after a successful save.
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:08d}")
    primary = jax.process_index() == 0
    # one in-flight save at a time, REGARDLESS of this call's mode: a sync
    # save issued while an async save commits must not prune/overwrite the
    # in-flight step dir (the in-flight state is module-global)
    wait_for_saves()
    if primary and os.path.exists(path):  # re-saving a step (resume) overwrites
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    _barrier(f"ckpt_pre_save_{step}")
    if async_save:
        # returns once the state is snapshotted to host; the write commits
        # in the background while training continues
        _async_ckptr().save(os.path.join(path, "state"), args=ocp.args.StandardSave(state))
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "state"), state)
        ckptr.wait_until_finished()
    if model_only is not None:
        # collective gather so model-axis-sharded weights export whole;
        # canonical export layout is the unrolled block_{i} trunk (stacked
        # pipeline trunks are re-laid — parallel/pipeline.py)
        from ..parallel.pipeline import unstack_in_tree

        model_host = unstack_in_tree(host_local_tree(model_only))
    if primary:
        os.makedirs(path, exist_ok=True)  # async: state/ may still be in flight
        if cfg is not None:
            with open(os.path.join(path, "config.json"), "w") as f:
                json.dump(
                    cfg.to_dict(resolve=False) if isinstance(cfg, Config) else cfg, f
                )
        if model_only is not None:
            np.savez(
                os.path.join(path, "model.npz"),
                **{k: v for k, v in _flatten("", model_host)},
            )
        if keep_last > 0:
            import shutil

            # only COMMITTED checkpoints (state/ atomically renamed into
            # place by Orbax) count toward keep_last: the just-scheduled
            # async save and any partial dir a crashed run left behind must
            # not displace the last good checkpoint
            root = os.path.abspath(ckpt_dir)
            all_steps = [d for d in os.listdir(root) if re.fullmatch(r"\d{8}", d)]
            for junk in all_steps:  # crash leftovers (never the in-flight dir)
                if junk != f"{step:08d}" and not is_committed(os.path.join(root, junk)):
                    shutil.rmtree(os.path.join(root, junk), ignore_errors=True)
            steps = sorted(
                d for d in all_steps if is_committed(os.path.join(root, d))
            )
            # keep the newest N by step number, but never delete the checkpoint
            # just written (a resume from an earlier step saves a lower number
            # than stale later ones)
            for old in steps[:-keep_last]:
                if old == f"{step:08d}":
                    continue
                shutil.rmtree(
                    os.path.join(os.path.abspath(ckpt_dir), old), ignore_errors=True
                )
    if not async_save:  # async commits its own cross-process barrier at finalize
        _barrier(f"ckpt_post_save_{step}")
    return path


def load_checkpoint(path: str, abstract_state) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint` onto the SHARDINGS
    of ``abstract_state`` (a matching pytree of concrete sharded arrays or
    ShapeDtypeStructs, e.g. a freshly-created state). Multi-host: collective
    — every process calls with its identically-sharded template and receives
    its shards.

    Legacy qkv layout: checkpoints saved before the TP-shardable [C, 3, C]
    qkv layout (nn.layers._QKVParams) stored flat [C, 3C] kernels / [3C]
    biases. Those restore through a reshape shim — the flat layout is the
    same values row-major (the 3-D layout is literally its reshape).

    Legacy LM head: checkpoints saved before LMLossHead grew its learnable
    ``logit_scale`` (nn/losses.py) hold an EMPTY ``lm_loss`` subtree; those
    restore through a fill shim that keeps the fresh-init scale (log 1/0.07
    = temperature-1 behavior, exactly what the old head computed) and
    zero optimizer moments from the caller's state. The two shims are
    independent retries — a checkpoint old enough to need both predates
    the captioning head entirely."""

    wait_for_saves()  # never read past an in-flight async save

    def as_abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    template = jax.tree_util.tree_map(as_abstract, abstract_state)
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(os.path.abspath(path), "state")
    try:
        return ckptr.restore(state_path, template)
    except Exception:
        restored = _restore_legacy_qkv(ckptr, state_path, template)
        if restored is None:
            restored = _restore_missing_lm_scale(
                ckptr, state_path, template, abstract_state
            )
        if restored is None:
            raise
        return restored


def _restore_legacy_qkv(ckptr, state_path: str, template) -> Optional[Any]:
    """Retry a failed template restore against the pre-[C,3,C] qkv layout:
    restore flat-shaped qkv leaves replicated, reshape, re-place onto the
    target shardings. Returns None when the stored shapes are NOT the
    legacy layout (the original error should propagate)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def keystr(kp) -> str:
        return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in kp)

    legacy_paths = set()

    def to_legacy(kp, x):
        if not isinstance(x, jax.ShapeDtypeStruct):
            return x
        ks = keystr(kp)
        shard = x.sharding
        repl = (
            NamedSharding(shard.mesh, P())
            if isinstance(shard, NamedSharding)
            else shard
        )
        if ks.endswith("qkv/kernel") and x.ndim == 3 and x.shape[1] == 3:
            legacy_paths.add(ks)
            d = x.shape[0]
            return jax.ShapeDtypeStruct((d, 3 * d), x.dtype, sharding=repl)
        if ks.endswith("qkv/bias") and x.ndim == 2 and x.shape[0] == 3:
            legacy_paths.add(ks)
            return jax.ShapeDtypeStruct((3 * x.shape[1],), x.dtype, sharding=repl)
        return x

    legacy_template = jax.tree_util.tree_map_with_path(to_legacy, template)
    if not legacy_paths:
        return None
    try:
        raw = ckptr.restore(state_path, legacy_template)
    except Exception:
        return None  # not the legacy layout either — surface the original

    def back(kp, x, t):
        # only the legacy leaves need re-placement (everything else was
        # restored straight onto the template sharding). The flat qkv
        # restores replicated, so every host holds the full table;
        # make_array_from_callback hands each device ITS slice of the
        # reshaped array — device_put of a host array would raise for
        # shardings that span non-addressable devices (multi-host).
        if keystr(kp) not in legacy_paths:
            return x
        arr = np.asarray(jax.device_get(x)).reshape(t.shape)
        if isinstance(t, jax.ShapeDtypeStruct) and t.sharding is not None:
            return jax.make_array_from_callback(
                t.shape, t.sharding, lambda idx, a=arr: a[idx]
            )
        return arr

    return jax.tree_util.tree_map_with_path(back, raw, template)


def _restore_missing_lm_scale(ckptr, state_path: str, template, fresh_state):
    """Retry a failed template restore against a checkpoint whose LMLossHead
    predates the learnable ``logit_scale``: every ``lm_loss`` node that is
    exactly ``{"logit_scale": leaf}`` in the template (the param AND its
    optimizer-moment mirrors) is an empty dict on disk. Restore with those
    nodes emptied, then fill the scale leaves from ``fresh_state`` — the
    caller's freshly-initialized state, whose values are the correct
    defaults (init log 1/0.07 for the param, zeros for Adam moments).
    Returns None when the template has no such node or the emptied-template
    restore also fails (the original error should propagate)."""

    def keystr(kp) -> str:
        return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in kp)

    def is_new_lm(kp, x) -> bool:
        return (
            isinstance(x, dict)
            and set(x.keys()) == {"logit_scale"}
            and keystr(kp).split("/")[-1] == "lm_loss"
        )

    dropped_prefixes = []

    def drop(kp, x):
        if is_new_lm(kp, x):
            dropped_prefixes.append(keystr(kp) + "/")
            return {}
        return x

    legacy_template = jax.tree_util.tree_map_with_path(
        drop, template, is_leaf=lambda x: isinstance(x, dict)
        and set(x.keys()) == {"logit_scale"}
    )
    if not dropped_prefixes:
        return None
    try:
        raw = ckptr.restore(state_path, legacy_template)
    except Exception:
        return None  # not the legacy layout either — surface the original

    # stitch the restored leaves back into the FULL template structure,
    # taking the dropped scale leaves from the fresh state
    raw_leaves = {
        keystr(kp): v for kp, v in jax.tree_util.tree_flatten_with_path(raw)[0]
    }

    def fill(kp, fresh_leaf):
        ks = keystr(kp)
        if any(ks.startswith(p) for p in dropped_prefixes):
            if isinstance(fresh_leaf, jax.Array):
                return fresh_leaf  # fresh init value, already placed
            # abstract caller (ShapeDtypeStruct): synthesize the default
            from ..nn.losses import LOGIT_SCALE_INIT

            val = np.asarray(
                LOGIT_SCALE_INIT if "params" in ks else 0.0,
                getattr(fresh_leaf, "dtype", np.float32),
            )
            shard = getattr(fresh_leaf, "sharding", None)
            if shard is not None:
                return jax.make_array_from_callback(
                    fresh_leaf.shape, shard, lambda idx, a=val: a[idx]
                )
            return val
        return raw_leaves[ks]

    return jax.tree_util.tree_map_with_path(fill, fresh_state)


def load_checkpoint_config(path: str) -> Optional[Config]:
    p = os.path.join(path, "config.json")
    if os.path.exists(p):
        with open(p) as f:
            return Config(json.load(f))
    return None


def is_committed(step_dir: str) -> bool:
    """True when the step dir holds a finalized state (Orbax renames the
    tmp dir to ``state/`` atomically at commit) — partial dirs left by a
    crashed/preempted async save have config.json but no ``state/``."""
    return os.path.isdir(os.path.join(step_dir, "state"))


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        d
        for d in os.listdir(ckpt_dir)
        if re.fullmatch(r"\d{8}", d) and is_committed(os.path.join(ckpt_dir, d))
    ]
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
