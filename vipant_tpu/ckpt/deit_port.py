"""timm DeiT ("meme") checkpoint → DeiTTower params.

Parity with the reference's torch.hub DeiT loader
(`/root/reference/cvap/model/helper.py:52-63`): key remap from timm's
``deit_base_distilled_patch16_224`` state dict, with pos-emb slice/interp
onto the tower's grid (2 prefix tokens: class + distillation).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from ..nn.deit import DeiTTower
from ..nn.stages import vit_grid
from ..ops.interp import interp_conv_kernel_spatial, slice_or_interp_pos_grid
from .clip_port import _np


def port_deit(sd: Dict[str, Any], tower: DeiTTower) -> Dict[str, Any]:
    sd = {k: _np(v) for k, v in sd.items()}
    grid, patch_hw, _ = vit_grid(tower.resolution, tower.patch_size, tower.stride)

    pos = sd["pos_embed"]
    if pos.ndim == 3:
        pos = pos[0]
    n_src = pos.shape[0] - 2
    s = int(round(np.sqrt(n_src)))
    pos = slice_or_interp_pos_grid(pos, (s, s), grid, n_prefix=2, use_slice=False)

    kernel = np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0))  # HWIO
    kernel = interp_conv_kernel_spatial(kernel, patch_hw)
    if kernel.shape[2] != int(tower.in_channels):
        # channel mean-collapse for 1-channel (log-mel) input — the
        # reference does this at forward time
        # (`/root/reference/cvap/module/deit.py:45-48`); port time is
        # equivalent and keeps the conv on the fast path
        assert int(tower.in_channels) == 1, (kernel.shape, tower.in_channels)
        kernel = kernel.mean(axis=2, keepdims=True)

    blocks: Dict[int, Dict[str, np.ndarray]] = {}
    block_re = re.compile(r"^blocks\.(\d+)\.(.+)$")
    for k, v in sd.items():
        m = block_re.match(k)
        if m:
            blocks.setdefault(int(m.group(1)), {})[m.group(2)] = v

    def port_block(sub):
        C = sub["attn.qkv.weight"].shape[1]
        return {
            "attn": {
                # [3C, C] -> [C, 3C] (q|k|v) -> TP-shardable [C, 3, C]
                "qkv": {
                    "kernel": np.ascontiguousarray(sub["attn.qkv.weight"].T).reshape(C, 3, C),
                    "bias": np.asarray(sub["attn.qkv.bias"]).reshape(3, C),
                },
                "out": {"kernel": sub["attn.proj.weight"].T, "bias": sub["attn.proj.bias"]},
            },
            "ln_1": {"scale": sub["norm1.weight"], "bias": sub["norm1.bias"]},
            "ln_2": {"scale": sub["norm2.weight"], "bias": sub["norm2.bias"]},
            "mlp": {
                "fc": {"kernel": sub["mlp.fc1.weight"].T, "bias": sub["mlp.fc1.bias"]},
                "proj": {"kernel": sub["mlp.fc2.weight"].T, "bias": sub["mlp.fc2.bias"]},
            },
        }

    params: Dict[str, Any] = {
        "patch_kernel": kernel,
        "patch_bias": sd["patch_embed.proj.bias"],
        "cls_token": sd["cls_token"].reshape(-1),
        "dist_token": sd["dist_token"].reshape(-1),
        "pos_embed": pos,
        "blocks": {f"block_{i}": port_block(sub) for i, sub in sorted(blocks.items())},
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    width, embed_dim = tower.width, tower.embed_dim
    # timm classification heads map only when dims agree; otherwise keep init
    if sd.get("head.weight") is not None and sd["head.weight"].shape[0] == embed_dim:
        params["head"] = sd["head.weight"].T
        params["head_dist"] = sd["head_dist.weight"].T
    else:
        scale = width ** -0.5
        rng = np.random.default_rng(0)
        params["head"] = (scale * rng.standard_normal((width, embed_dim))).astype(np.float32)
        params["head_dist"] = (scale * rng.standard_normal((width, embed_dim))).astype(
            np.float32
        )
    return {"params": params}
