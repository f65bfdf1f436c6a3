"""CLIP/torch state-dict → vipant_tpu param-tree porter.

This is the checkpoint bridge of SURVEY.md §3.4: the "visual knowledge
transfer" path by which CLIP image-tower weights initialize the audio tower
(grid retargeting) and by which released reference checkpoints load. It
implements, in NumPy at load time:

* key remapping from torch CLIP naming to the MetaHead stage tree
  (parity: `/root/reference/cvap/module/encoder/clip_head.py:126-292`);
* torch→flax layout transposes (OIHW→HWIO convs, [out,in]→[in,out] dense);
* positional-embedding slice-or-bilinear-interp onto the target tower grid
  (parity: `/root/reference/cvap/module/encoder/audio_head.py:54-134`);
* conv-kernel spatial interpolation for patch-size changes
  (parity: `/root/reference/cvap/module/encoder/audio_head.py:42-52`).

Channel mean-collapse for 1-channel audio input is *not* done here — it
stays a runtime op in the pre-encoder, matching the reference's forward-time
collapse (`/root/reference/cvap/module/val.py:240-247`).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..nn.heads import TextTower, VisionTower
from ..nn.stages import vit_grid
from ..ops.interp import interp_conv_kernel_spatial, slice_or_interp_pos_grid


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def split_clip_state_dict(sd: Dict[str, Any]) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Full CLIP state dict → (visual_sd without prefix, text_sd).

    Mirrors the split the reference does when initializing towers from a
    CLIP checkpoint (`/root/reference/cvap/model/helper.py:32-50`).
    """
    visual, text = {}, {}
    for k, v in sd.items():
        if k.startswith("visual."):
            visual[k[len("visual.") :]] = _np(v)
        elif k.startswith(("transformer.", "token_embedding.", "ln_final.")) or k in (
            "positional_embedding",
            "text_projection",
            "logit_scale",
        ):
            text[k] = _np(v)
    return visual, text


# ---------------------------------------------------------------------------
# transformer blocks (shared by visual ViT and text towers)
# ---------------------------------------------------------------------------

_BLOCK_RE = re.compile(r"^transformer\.resblocks\.(\d+)\.(.+)$")


def _port_block(sub: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """One torch ResidualAttentionBlock → one flax block param dict."""
    C = sub["attn.in_proj_weight"].shape[1]
    out = {
        "attn": {
            "qkv": {
                # torch packed [3C, C] -> transpose -> [C, 3C] (q|k|v) ->
                # the TP-shardable [C, 3, C] layout (nn.layers._QKVParams)
                "kernel": np.ascontiguousarray(sub["attn.in_proj_weight"].T).reshape(C, 3, C),
                "bias": np.asarray(sub["attn.in_proj_bias"]).reshape(3, C),
            },
            "out": {
                "kernel": sub["attn.out_proj.weight"].T,
                "bias": sub["attn.out_proj.bias"],
            },
        },
        "ln_1": {"scale": sub["ln_1.weight"], "bias": sub["ln_1.bias"]},
        "ln_2": {"scale": sub["ln_2.weight"], "bias": sub["ln_2.bias"]},
        "mlp": {
            "fc": {"kernel": sub["mlp.c_fc.weight"].T, "bias": sub["mlp.c_fc.bias"]},
            "proj": {
                "kernel": sub["mlp.c_proj.weight"].T,
                "bias": sub["mlp.c_proj.bias"],
            },
        },
    }
    return out


def _port_transformer(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    blocks: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = _BLOCK_RE.match(k)
        if m:
            blocks.setdefault(int(m.group(1)), {})[m.group(2)] = v
    return {
        "transformer": {
            f"block_{i}": _port_block(sub) for i, sub in sorted(blocks.items())
        }
    }


# ---------------------------------------------------------------------------
# towers
# ---------------------------------------------------------------------------


def port_clip_visual(
    visual_sd: Dict[str, np.ndarray],
    tower: VisionTower,
    use_slice: bool = True,
    src_grid: Optional[Tuple[int, int]] = None,
) -> Dict[str, Any]:
    """Visual CLIP weights → VisionTower variable collections
    (``{"params": ...}``; ResNet towers also carry ``"batch_stats"``),
    re-gridded to the tower's (possibly rectangular) patch grid.

    ``src_grid``: grid of the stored positional embedding; inferred as
    square from its length when omitted (CLIP checkpoints). Reference audio
    checkpoints store rectangular grids — pass theirs explicitly."""
    sd = {k: _np(v) for k, v in visual_sd.items()}
    if tower.backbone == "resnet":
        return _port_clip_resnet(sd, tower)

    grid, patch_hw, _ = vit_grid(tower.resolution, tower.patch_size, tower.stride)
    n_pos = sd["positional_embedding"].shape[0]
    if src_grid is None:
        s = int(round(np.sqrt(n_pos - 1)))
        src_grid = (s, s)
    pos = slice_or_interp_pos_grid(
        sd["positional_embedding"], src_grid, grid, n_prefix=1, use_slice=use_slice
    )

    kernel = sd["conv1.weight"]  # [O, I, H, W]
    kernel = np.transpose(kernel, (2, 3, 1, 0))  # HWIO
    kernel = interp_conv_kernel_spatial(kernel, patch_hw)

    params: Dict[str, Any] = {
        "misc": {
            "positional_embedding": pos,
            "class_embedding": sd["class_embedding"],
        },
        "pre": {
            "kernel": kernel,
            "ln": {"scale": sd["ln_pre.weight"], "bias": sd["ln_pre.bias"]},
        },
        "encoder": _port_transformer(sd),
        "post": {
            "ln": {"scale": sd["ln_post.weight"], "bias": sd["ln_post.bias"]},
            "proj": sd["proj"],
        },
    }
    return {"params": params}


def port_audio_from_visual(
    visual_sd: Dict[str, np.ndarray], tower: VisionTower, use_slice: bool = False
) -> Dict[str, Any]:
    """CLIP image weights → audio tower: same remap, but the square image
    pos-grid is bilinearly re-gridded onto the rectangular time×freq grid
    (slice-first is only meaningful audio→audio)."""
    return port_clip_visual(visual_sd, tower, use_slice=use_slice)


def port_audio_from_audio(
    audio_params: Dict[str, Any],
    old_grid: Tuple[int, int],
    tower: VisionTower,
    use_slice: bool = True,
) -> Dict[str, Any]:
    """Retarget an already-ported audio tower param tree to a new time/freq
    grid (the ``from_pretrained`` path that loads a 10 s model for 18 s
    Clotho eval; parity:
    `/root/reference/cvap/module/encoder/clip_head.py:172-191`)."""
    params = _copy_tree(audio_params)
    grid, patch_hw, _ = vit_grid(tower.resolution, tower.patch_size, tower.stride)
    pos = _np(params["misc"]["positional_embedding"])
    params["misc"]["positional_embedding"] = slice_or_interp_pos_grid(
        pos, old_grid, grid, n_prefix=1, use_slice=use_slice
    )
    params["pre"]["kernel"] = interp_conv_kernel_spatial(
        _np(params["pre"]["kernel"]), patch_hw
    )
    return params


def port_clip_text(text_sd: Dict[str, np.ndarray], tower: TextTower) -> Dict[str, Any]:
    sd = {k: _np(v) for k, v in text_sd.items()}
    ctx = tower.ctx_len
    return {
        "params": {
            "misc": {"positional_embedding": sd["positional_embedding"][:ctx]},
            "pre": {"token_embedding": sd["token_embedding.weight"]},
            "encoder": _port_transformer(sd),
            "post": {
                "ln": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
                "proj": sd["text_projection"],
            },
        }
    }


# ---------------------------------------------------------------------------
# ResNet visual tower
# ---------------------------------------------------------------------------


def _bn(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
    )


def _conv(sd, key):
    return {"kernel": np.transpose(sd[key], (2, 3, 1, 0))}  # OIHW → HWIO


def _port_clip_resnet(sd: Dict[str, np.ndarray], tower: VisionTower) -> Dict[str, Any]:
    params: Dict[str, Any] = {"pre": {}, "encoder": {}, "post": {}}
    stats: Dict[str, Any] = {"pre": {}, "encoder": {}}
    for i in (1, 2, 3):
        params["pre"][f"conv{i}"] = _conv(sd, f"conv{i}.weight")
        p, s = _bn(sd, f"bn{i}")
        params["pre"][f"bn{i}"], stats["pre"][f"bn{i}"] = p, s

    layer_re = re.compile(r"^layer(\d)\.(\d+)\.(.+)$")
    blocks: Dict[Tuple[int, int], Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = layer_re.match(k)
        if m:
            blocks.setdefault((int(m.group(1)), int(m.group(2))), {})[m.group(3)] = v
    for (stage, b), sub in sorted(blocks.items()):
        name = f"layer{stage}_{b}"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for i in (1, 2, 3):
            bp[f"conv{i}"] = _conv(sub, f"conv{i}.weight")
            p, s = _bn(sub, f"bn{i}")
            bp[f"bn{i}"], bs[f"bn{i}"] = p, s
        if "downsample.0.weight" in sub:
            bp["downsample_conv"] = _conv(sub, "downsample.0.weight")
            p, s = _bn(sub, "downsample.1")
            bp["downsample_bn"], bs["downsample_bn"] = p, s
        params["encoder"][name] = bp
        stats["encoder"][name] = bs

    n_pos = sd["attnpool.positional_embedding"].shape[0]
    src = int(round(np.sqrt(n_pos - 1)))
    pos = slice_or_interp_pos_grid(
        sd["attnpool.positional_embedding"], (src, src), tower.grid, n_prefix=1,
        use_slice=False,
    )
    params["post"] = {
        "positional_embedding": pos,
        "q_proj": {
            "kernel": sd["attnpool.q_proj.weight"].T,
            "bias": sd["attnpool.q_proj.bias"],
        },
        "k_proj": {
            "kernel": sd["attnpool.k_proj.weight"].T,
            "bias": sd["attnpool.k_proj.bias"],
        },
        "v_proj": {
            "kernel": sd["attnpool.v_proj.weight"].T,
            "bias": sd["attnpool.v_proj.bias"],
        },
        "c_proj": {
            "kernel": sd["attnpool.c_proj.weight"].T,
            "bias": sd["attnpool.c_proj.bias"],
        },
    }
    return {"params": params, "batch_stats": stats}


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree
