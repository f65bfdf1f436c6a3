"""Checkpoint application shared by the trainers and the inference engine.

Mirrors the reference's init priority — explicit checkpoint > CLIP weights >
random (`/root/reference/cvap/model/cvap.py:61-128`) — as pure functions
over (model, variables)."""

from __future__ import annotations

import os
from typing import Optional

from .reference_port import (
    load_torch_file,
    port_reference_audio,
    port_reference_image,
    port_reference_text,
    reference_loss_params,
    split_reference_checkpoint,
)


def apply_reference_ckpt(model, variables, path: str, echo=None):
    """Load a reference-format ``.pth`` tuple checkpoint into the model's
    variable collections (tuple arity semantics of
    `/root/reference/cvap/model/helper.py:10-30`)."""
    ckpt_cfg, payload = load_torch_file(path)
    parts = split_reference_checkpoint(payload)
    params = dict(variables["params"])
    if "audio" in parts and "audio" in params and parts["audio"]:
        params["audio"] = port_reference_audio(
            parts["audio"], model.audio, ckpt_cfg
        )["params"]
    if "image" in parts and "image" in params and parts["image"]:
        params["image"] = port_reference_image(parts["image"], model.image)["params"]
    if "text" in parts and "text" in params and parts["text"]:
        params["text"] = port_reference_text(parts["text"], model.text)["params"]
    if "loss" in parts and "loss" in params and parts["loss"]:
        extra = reference_loss_params(parts["loss"])
        if "logit_scale" in extra and "logit_scale" in params["loss"]:
            # copy the subtree: don't mutate the caller's nested variables
            params["loss"] = {**params["loss"], "logit_scale": extra["logit_scale"]}
    if echo is not None:
        echo.info(f"loaded reference checkpoint {path} ({sorted(parts)})")
    from ..parallel.pipeline import adapt_trunk_layout

    params = adapt_trunk_layout(params, variables["params"])
    return {**variables, "params": params}


def clip_weights_path(cfg) -> Optional[str]:
    run = cfg.get("running")
    if run is None:
        return None
    root = str(run.get("clip_model_root", "") or "")
    name = str(run.get("clip_model_name", "") or "")
    if not name:
        return None
    from .zoo import _MODELS, resolve

    if name in _MODELS:
        # zoo name: canonical-filename resolution + sha256 verification
        # (the offline half of `/root/reference/clip/clip.py:18-57`). A
        # missing artifact OR a checksum mismatch falls through to the
        # plain {root}/{name}.pt convention — a user's own fine-tuned
        # weights stored under a zoo name must keep loading (the reference
        # would re-download on mismatch; offline, their file is the intent).
        try:
            return resolve(
                name, root, verify=bool(run.get("clip_verify_sha", True))
            )
        except FileNotFoundError:
            pass
        except RuntimeError as e:
            import warnings

            warnings.warn(
                f"{e}; treating it as custom (non-zoo) weights and loading "
                f"via the plain path convention"
            )
    for ext in (".pt", ".pth"):
        p = os.path.join(root, name + ext)
        if os.path.exists(p):
            return p
    return None
