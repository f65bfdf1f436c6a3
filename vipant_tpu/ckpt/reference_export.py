"""vipant_tpu param trees → reference VIP-ANT ``.pth`` checkpoints.

The reverse bridge of :mod:`vipant_tpu.ckpt.reference_port`: writes
checkpoints in the reference's ``{"cfg", "model": tuple-of-state-dicts}``
format (tuple arity 2 = (audio, loss), 4 = (image, audio, text, loss),
`/root/reference/cvap/model/helper.py:10-30`) with MetaHead-layout keys
(`/root/reference/cvap/module/encoder/clip_head.py:126-292`), so models
trained here can be evaluated by the original codebase — and so the
round-trip (export → our own loader) is testable without released weights.

Layout inverses of clip_port: flax HWIO conv → torch OIHW, ``[in, out]``
dense kernels → torch ``[out, in]`` weights, packed qkv → torch
``in_proj_weight``/``in_proj_bias``. The config snapshot is stored as a
plain dict (the reference stores an OmegaConf object; its loader only
touches ``cfg.model.*`` at audio-retarget time, so pass a real reference
config there if that path is needed).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x)


def _export_block(block: Dict[str, Any], out: Dict[str, np.ndarray], prefix: str) -> None:
    attn, mlp = block["attn"], block["mlp"]
    # [C, 3, C] param layout -> classic packed [C, 3C] -> torch [3C, C]
    qk = _t(attn["qkv"]["kernel"])
    out[f"{prefix}.attn.in_proj_weight"] = qk.reshape(qk.shape[0], -1).T
    out[f"{prefix}.attn.in_proj_bias"] = _t(attn["qkv"]["bias"]).reshape(-1)
    out[f"{prefix}.attn.out_proj.weight"] = _t(attn["out"]["kernel"]).T
    out[f"{prefix}.attn.out_proj.bias"] = _t(attn["out"]["bias"])
    out[f"{prefix}.ln_1.weight"] = _t(block["ln_1"]["scale"])
    out[f"{prefix}.ln_1.bias"] = _t(block["ln_1"]["bias"])
    out[f"{prefix}.ln_2.weight"] = _t(block["ln_2"]["scale"])
    out[f"{prefix}.ln_2.bias"] = _t(block["ln_2"]["bias"])
    out[f"{prefix}.mlp.c_fc.weight"] = _t(mlp["fc"]["kernel"]).T
    out[f"{prefix}.mlp.c_fc.bias"] = _t(mlp["fc"]["bias"])
    out[f"{prefix}.mlp.c_proj.weight"] = _t(mlp["proj"]["kernel"]).T
    out[f"{prefix}.mlp.c_proj.bias"] = _t(mlp["proj"]["bias"])


def _export_blocks(encoder: Dict[str, Any], stem: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    blocks = encoder["transformer"]
    for name in sorted(blocks, key=lambda n: int(n.split("_")[1])):
        i = int(name.split("_")[1])
        _export_block(blocks[name], out, f"{stem}.resblocks.{i}")
    return out


def export_visual_sd(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """ViT VisionTower params → MetaHead-layout torch-style state dict
    (the format `reference_port._METAHEAD_VISUAL` normalizes from)."""
    out: Dict[str, np.ndarray] = {
        "misc.positional_embedding": _t(params["misc"]["positional_embedding"]),
        "misc.class_embedding": _t(params["misc"]["class_embedding"]),
        # HWIO → OIHW
        "pre_encoder.conv1.weight": np.transpose(_t(params["pre"]["kernel"]), (3, 2, 0, 1)),
        "pre_encoder.ln.weight": _t(params["pre"]["ln"]["scale"]),
        "pre_encoder.ln.bias": _t(params["pre"]["ln"]["bias"]),
        "post_encoder.ln.weight": _t(params["post"]["ln"]["scale"]),
        "post_encoder.ln.bias": _t(params["post"]["ln"]["bias"]),
        "post_encoder.proj": _t(params["post"]["proj"]),
    }
    out.update(_export_blocks(params["encoder"], "encoder"))
    return out


def export_text_sd(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """TextTower params → MetaHead-layout state dict
    (inverse of `reference_port._METAHEAD_TEXT`)."""
    out: Dict[str, np.ndarray] = {
        "misc.positional_embedding": _t(params["misc"]["positional_embedding"]),
        "pre_encoder.token_embedding.weight": _t(params["pre"]["token_embedding"]),
        "post_encoder.ln.weight": _t(params["post"]["ln"]["scale"]),
        "post_encoder.ln.bias": _t(params["post"]["ln"]["bias"]),
        "post_encoder.proj": _t(params["post"]["proj"]),
    }
    out.update(_export_blocks(params["encoder"], "encoder"))
    return out


def export_loss_sd(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Loss-head params → state dict. ``logit_scale`` is the transferable
    piece (`/root/reference/cvap/module/decoder/loss_head.py:246-260`);
    other leaves are exported flat for completeness."""
    out: Dict[str, np.ndarray] = {}

    def walk(prefix, tree):
        for k, v in tree.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                walk(key + ".", v)
            else:
                out[key] = _t(v)

    walk("", params)
    return out


_EXPORTERS = {
    "image": export_visual_sd,
    "audio": export_visual_sd,
    "text": export_text_sd,
    "loss": export_loss_sd,
}


def export_reference_pth(
    path: str, parts: Dict[str, Dict[str, Any]], cfg: Optional[Any] = None
) -> str:
    """Write a reference-format ``.pth``: 2-tuple when ``parts`` has only
    audio(+loss), 4-tuple when it carries image/text too. Values are torch
    fp32 tensors (the reference's ``load_state_dict`` path)."""
    import torch

    def to_sd(kind, tree):
        from ..parallel.pipeline import unstack_in_tree

        sd = _EXPORTERS[kind](unstack_in_tree(tree))
        return {k: torch.from_numpy(np.asarray(v, np.float32).copy()) for k, v in sd.items()}

    if "image" in parts or "text" in parts:
        order = ("image", "audio", "text", "loss")
    else:
        order = ("audio", "loss")
    model = tuple(to_sd(k, parts[k]) if parts.get(k) else {} for k in order)

    cfg_dict = None
    if cfg is not None:
        cfg_dict = cfg.to_dict(resolve=False) if hasattr(cfg, "to_dict") else dict(cfg)
    torch.save({"cfg": cfg_dict, "model": model}, path)
    return path
