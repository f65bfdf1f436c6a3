"""DeiT-style distilled ViT tower (cls + distillation tokens averaged).

Capability parity with the reference's DeiT head family
(`/root/reference/cvap/module/deit.py:56-105` — a timm
``DistilledVisionTransformer`` subclass averaging the class and distillation
token outputs — and the heads wrapping it,
`/root/reference/cvap/module/encoder/image_head.py:59-86`,
`audio_head.py:214-283`): patch embed with separate stride + channel
collapse, two prefix tokens, exact-GELU blocks, twin projection heads whose
outputs are averaged. Initialized from the "meme" torch.hub DeiT weights via
:func:`vipant_tpu.ckpt.deit_port.port_deit` when available
(`/root/reference/cvap/model/helper.py:52-63`).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.patches import patchify_embed
from .heads import AUDIO_HEADS, IMAGE_HEADS, normalize
from .layers import LayerNorm, Transformer
from .stages import to_2tuple, vit_grid


class DeiTTower(nn.Module):
    width: int = 768
    embed_dim: int = 512
    resolution: Any = 224
    patch_size: Any = 16
    stride: Any = None
    in_channels: int = 3
    heads: int = 12
    layers: int = 12
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    remat: bool = False

    @property
    def grid(self) -> Tuple[int, int]:
        g, _, _ = vit_grid(self.resolution, self.patch_size, self.stride)
        return g

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, normalized: bool = False
    ) -> jnp.ndarray:
        patch_hw = to_2tuple(self.patch_size)
        stride_hw = to_2tuple(self.stride) if self.stride is not None else patch_hw
        kernel = self.param(
            "patch_kernel",
            nn.initializers.lecun_normal(),
            (*patch_hw, self.in_channels, self.width),
            self.param_dtype,
        )
        bias = self.param(
            "patch_bias", nn.initializers.zeros, (self.width,), self.param_dtype
        )
        if x.shape[1] != kernel.shape[2]:  # channel collapse (deit.py:10-54)
            kernel = jnp.mean(kernel, axis=2, keepdims=True)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        h = patchify_embed(
            x, kernel.astype(self.dtype), patch_hw, stride_hw
        ) + bias.astype(self.dtype)

        B, N, D = h.shape
        scale = self.width ** -0.5
        cls = self.param("cls_token", nn.initializers.normal(0.02), (D,), self.param_dtype)
        dist = self.param("dist_token", nn.initializers.normal(0.02), (D,), self.param_dtype)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (N + 2, D), self.param_dtype
        )
        prefix = jnp.stack([cls, dist]).astype(self.dtype)
        h = jnp.concatenate([jnp.broadcast_to(prefix[None], (B, 2, D)), h], axis=1)
        h = h + pos[None].astype(self.dtype)

        h = Transformer(
            layers=self.layers,
            num_heads=self.heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            act="gelu",
            remat=self.remat,
            name="blocks",
        )(h)
        h = LayerNorm(param_dtype=self.param_dtype, name="norm")(h)

        head = self.param(
            "head", nn.initializers.normal(scale), (D, self.embed_dim), self.param_dtype
        )
        head_dist = self.param(
            "head_dist", nn.initializers.normal(scale), (D, self.embed_dim), self.param_dtype
        )
        out = 0.5 * (
            h[:, 0] @ head.astype(h.dtype) + h[:, 1] @ head_dist.astype(h.dtype)
        )
        return normalize(out) if normalized else out


def _deit_from_cfg(cfg, dtype=jnp.float32, param_dtype=jnp.float32, remat=False):
    resolution = cfg.resolution
    if isinstance(resolution, list):
        resolution = tuple(int(v) for v in resolution)
    pre = cfg.get("pre_encoder", None)
    patch = pre.get("patch_size", 16) if pre is not None else cfg.get("patch_size", 16)
    stride = pre.get("stride", None) if pre is not None else cfg.get("stride", None)
    # the reference's legacy deit.yaml spells it "in_channel" (singular)
    in_ch = (
        pre.get("in_channels", 3)
        if pre is not None
        else cfg.get("in_channels", cfg.get("in_channel", 3))
    )
    return DeiTTower(
        width=int(cfg.width),
        embed_dim=int(cfg.embed_dim),
        resolution=resolution,
        patch_size=patch,
        stride=stride,
        in_channels=int(in_ch),
        heads=int(cfg.get("heads", 12)),
        layers=int(
            cfg.encoder.layers if "encoder" in cfg else cfg.get("layers", 12)
        ),
        dtype=dtype,
        param_dtype=param_dtype,
        remat=remat,
    )


IMAGE_HEADS.register(_deit_from_cfg, name="DeiTImageHead")
AUDIO_HEADS.register(_deit_from_cfg, name="NaiveDeiTAudioHead")
