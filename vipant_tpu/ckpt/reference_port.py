"""Reference VIP-ANT ``.pth`` checkpoint → vipant_tpu param trees.

One-way converter for the released checkpoints (SURVEY.md §2.9): the
reference saves ``{"cfg", "model": tuple-of-state-dicts}`` where tuple arity
2 = (audio, loss) and 4 = (image, audio, text, loss)
(`/root/reference/cvap/model/helper.py:10-30`). Tower state dicts come in
two namings — the 4-stage MetaHead layout
(`/root/reference/cvap/module/encoder/clip_head.py`) and the "naive" layout
that nests a whole VisualTransformer under ``encoder.``
(`/root/reference/cvap/module/encoder/audio_head.py:136-162`). Both are
normalized to CLIP-style naming and routed through
:mod:`vipant_tpu.ckpt.clip_port` (shared transposes + grid retarget).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..nn.heads import TextTower, VisionTower
from ..nn.stages import vit_grid
from .clip_port import _np, port_clip_text, port_clip_visual


def load_torch_file(path: str):
    """torch.load with jit-archive fallback; returns (cfg_or_None, payload)."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        obj = torch.jit.load(path, map_location="cpu").state_dict()
    if isinstance(obj, dict) and "model" in obj:
        return obj.get("cfg"), obj["model"]
    if hasattr(obj, "state_dict"):
        return None, obj.state_dict()
    return None, obj


def split_reference_checkpoint(model_payload) -> Dict[str, Dict[str, np.ndarray]]:
    """Arity-based tuple parse (2 = audio+loss, 4 = image+audio+text+loss)."""
    parts = list(model_payload)
    if len(parts) == 2:
        keys = ["audio", "loss"]
    elif len(parts) == 4:
        keys = ["image", "audio", "text", "loss"]
    else:
        raise ValueError(f"unexpected checkpoint arity {len(parts)}")
    return {
        k: {kk: _np(vv) for kk, vv in (sd or {}).items()}
        for k, sd in zip(keys, parts)
    }


_METAHEAD_VISUAL = [
    (r"^misc\.positional_embedding$", "positional_embedding"),
    (r"^misc\.class_embedding$", "class_embedding"),
    (r"^pre_encoder\.conv1\.weight$", "conv1.weight"),
    (r"^pre_encoder\.ln\.(.+)$", r"ln_pre.\1"),
    (r"^encoder\.resblocks\.(.+)$", r"transformer.resblocks.\1"),
    (r"^post_encoder\.ln\.(.+)$", r"ln_post.\1"),
    (r"^post_encoder\.proj$", "proj"),
]

_METAHEAD_TEXT = [
    (r"^misc\.positional_embedding$", "positional_embedding"),
    (r"^pre_encoder\.token_embedding\.weight$", "token_embedding.weight"),
    (r"^encoder\.resblocks\.(.+)$", r"transformer.resblocks.\1"),
    (r"^post_encoder\.ln\.(.+)$", r"ln_final.\1"),
    (r"^post_encoder\.proj$", "text_projection"),
]


def _apply_rules(sd: Dict[str, np.ndarray], rules) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for pat, repl in rules:
            if re.match(pat, k):
                out[re.sub(pat, repl, k)] = v
                break
    return out


def _normalize_visual_sd(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    keys = list(sd.keys())
    if any(k.startswith("misc.") for k in keys):  # MetaHead layout
        return _apply_rules(sd, _METAHEAD_VISUAL)
    if any(k.startswith("encoder.") for k in keys):  # naive layout
        return {re.sub(r"^encoder\.", "", k): v for k, v in sd.items()}
    return sd


def port_reference_audio(
    audio_sd: Dict[str, np.ndarray],
    tower: VisionTower,
    ckpt_cfg=None,
    use_slice: bool = True,
) -> Dict[str, Any]:
    """Audio tower from a reference checkpoint, with the source grid derived
    from the checkpoint's own snapshot config when available (rectangular
    grids cannot be inferred from the pos-emb length)."""
    sd = _normalize_visual_sd(audio_sd)
    src_grid = None
    if ckpt_cfg is not None:
        try:
            a = ckpt_cfg["model"]["audio"] if isinstance(ckpt_cfg, dict) else ckpt_cfg.model.audio
            res = a["resolution"] if isinstance(a, dict) else a.resolution
            patch = a.get("patch_size", 32) if hasattr(a, "get") else 32
            stride = a.get("stride", None) if hasattr(a, "get") else None
            src_grid, _, _ = vit_grid(
                tuple(res) if isinstance(res, (list, tuple)) else res, patch, stride
            )
        except Exception:
            src_grid = None
    if src_grid is None:
        # fall back: assume stored grid shares the tower's freq columns
        n_pos = sd["positional_embedding"].shape[0] - 1
        ncol = tower.grid[1]
        if n_pos % ncol == 0:
            src_grid = (n_pos // ncol, ncol)
    return port_clip_visual(sd, tower, use_slice=use_slice, src_grid=src_grid)


def port_reference_text(text_sd: Dict[str, np.ndarray], tower: TextTower) -> Dict[str, Any]:
    sd = _apply_rules(text_sd, _METAHEAD_TEXT) if any(
        k.startswith("misc.") for k in text_sd
    ) else text_sd
    return port_clip_text(sd, tower)


def port_reference_image(image_sd: Dict[str, np.ndarray], tower: VisionTower) -> Dict[str, Any]:
    return port_clip_visual(_normalize_visual_sd(image_sd), tower)


def reference_loss_params(loss_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Extract what transfers from a reference loss head (logit_scale)."""
    out: Dict[str, Any] = {}
    if "logit_scale" in loss_sd:
        out["logit_scale"] = np.asarray(loss_sd["logit_scale"], np.float32)
    return out
