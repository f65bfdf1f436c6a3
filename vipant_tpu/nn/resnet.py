"""ModifiedResNet stages (CLIP RN50-style) as MetaHead components.

Capability parity with the reference's ResNet stages
(`/root/reference/cvap/module/val.py:310-466`,
`/root/reference/cvap/module/resnet.py`): 3-conv anti-aliased stem,
bottlenecks whose stride is an avgpool before the 1×1 expansion, and an
attention pool head with rectangular-grid positional support. NHWC layout
for TPU; BatchNorm carries a ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.interp import interp_pos_grid
from .stages import ENCODER_MODULES, to_2tuple

Dtype = Any


def resnet_grid(resolution, down: int = 32) -> Tuple[int, int]:
    res = to_2tuple(resolution) if not isinstance(resolution, int) else (resolution, resolution)
    return (res[0] // down, res[1] // down)


class Bottleneck(nn.Module):
    """1×1 → 3×3 → (avgpool if stride>1) → 1×1(×4) with BN+ReLU, identity
    or avgpool+1×1 shortcut (parity: `/root/reference/clip/model.py:11-54`
    behavior, re-expressed NHWC)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            axis_name=None,
            name=name,
        )
        out = nn.Conv(self.planes, (1, 1), name="conv1", **kw)(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, name="conv2", **kw)(out)
        out = nn.relu(bn("bn2")(out))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = nn.Conv(self.planes * self.expansion, (1, 1), name="conv3", **kw)(out)
        out = bn("bn3")(out)

        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * self.expansion:
            identity = x
            if self.stride > 1:
                identity = nn.avg_pool(
                    identity, (self.stride, self.stride), (self.stride, self.stride)
                )
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1), name="downsample_conv", **kw
            )(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


@ENCODER_MODULES.register()
class ResNetPreEncoder(nn.Module):
    """3-conv stem + avgpool (parity: `/root/reference/cvap/module/val.py:310-355`).
    Input [B, C, H, W]; 1-channel input is broadcast to the stem's expected
    channels by kernel mean-collapse, like the ViT pre-encoder."""

    width: int  # CLIP RN "width" = stem output = width (e.g. 64)
    in_channels: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert x.ndim == 4
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        if x.shape[-1] != self.in_channels:
            x = jnp.broadcast_to(
                jnp.mean(x, axis=-1, keepdims=True),
                x.shape[:-1] + (self.in_channels,),
            )
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        x = nn.Conv(self.width // 2, (3, 3), strides=2, padding=1, name="conv1", **kw)(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(self.width // 2, (3, 3), padding=1, name="conv2", **kw)(x)
        x = nn.relu(bn("bn2")(x))
        x = nn.Conv(self.width, (3, 3), padding=1, name="conv3", **kw)(x)
        x = nn.relu(bn("bn3")(x))
        return nn.avg_pool(x, (2, 2), (2, 2))


@ENCODER_MODULES.register()
class ResNetBackbone(nn.Module):
    """4 bottleneck stages (parity: `/root/reference/cvap/module/val.py:426-466`)."""

    layers: Sequence[int]  # e.g. (3, 4, 6, 3)
    width: int  # stem width, e.g. 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for stage, blocks in enumerate(self.layers):
            planes = self.width * (2 ** stage)
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(
                    planes=planes,
                    stride=stride,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)
        return x


@ENCODER_MODULES.register()
class ResNetPostEncoder(nn.Module):
    """Attention pool: mean token as query over the grid, with rectangular
    positional embeddings re-gridded on the fly
    (parity: `/root/reference/cvap/module/val.py:357-424`)."""

    embed_dim: int  # feature dim entering the pool (width * 32 for RN50)
    output_dim: int
    heads: int
    stored_grid: Tuple[int, int]
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=C ** -0.5),
            (int(np.prod(self.stored_grid)) + 1, C),
            self.param_dtype,
        )
        pos = interp_pos_grid(pos, self.stored_grid, (H, W), n_prefix=1)

        x = x.reshape(B, H * W, C)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        x = x + pos[None].astype(x.dtype)

        dense = lambda d, name: nn.Dense(
            d, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = dense(C, "q_proj")(x[:, :1])
        k = dense(C, "k_proj")(x)
        v = dense(C, "v_proj")(x)

        head_dim = C // self.heads
        q = q.reshape(B, 1, self.heads, head_dim)
        k = k.reshape(B, -1, self.heads, head_dim)
        v = v.reshape(B, -1, self.heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(x.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, 1, C)
        return dense(self.output_dim, "c_proj")(out)[:, 0]
