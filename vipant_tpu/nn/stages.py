"""MetaHead encoder stages.

Every tower is the same 4-stage pipeline the reference factored its heads
into (`/root/reference/cvap/module/encoder/clip_head.py:19-120`):
``pre_encoder → pre_addon → encoder → post_addon → post_encoder`` plus a
``misc`` parameter container (class + positional embeddings). The factoring
is preserved because it is what makes CLIP-checkpoint remapping and siamese
cross-modal parameter sharing tractable; the stages themselves are
implemented TPU-first (NHWC convs, static shapes, fp32-island LN, bf16
compute).

Stage registry parity: `/root/reference/cvap/module/val.py` (ViTPreEncoder,
ViTPostEncoder, GPTPreEncoder, GPTPostEncoder, CLIPMisc, AddonEncoder,
TransformerBackbone, ResNet* — ResNet stages live in resnet.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.interp import interp_pos_grid
from ..utils import Registry
from .layers import LayerNorm, StackedTransformer, Transformer, causal_mask

Dtype = Any

ENCODER_MODULES = Registry("ENCODER_MODULES")


def to_2tuple(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def vit_grid(
    resolution, patch_size, stride=None
) -> Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]]:
    """(grid_hw, patch_hw, stride_hw) for a (possibly rectangular) ViT input.

    Square inputs divide evenly (CLIP behavior); rectangular inputs use the
    overlapping-stride formula of the reference's audio tower
    (`/root/reference/cvap/module/encoder/audio_head.py:28-40`).
    """
    patch_hw = to_2tuple(patch_size)
    stride_hw = to_2tuple(stride) if stride is not None else patch_hw
    if isinstance(resolution, int) and stride_hw == patch_hw and patch_hw[0] == patch_hw[1]:
        # CLIP behavior: square input divides evenly (no overlap). A
        # non-square patch must fall through to the general formula — the
        # square shortcut would size the pos-emb for an n x n grid while
        # patchify produces n x m tokens
        n = resolution // patch_hw[0]
        return (n, n), patch_hw, stride_hw
    # overlapping-stride formula — also for square inputs with a custom
    # stride, whose grid is NOT resolution // patch
    res = to_2tuple(resolution)
    nrow = (res[0] - patch_hw[0]) // stride_hw[0] + 1
    ncol = (res[1] - patch_hw[1]) // stride_hw[1] + 1
    return (nrow, ncol), patch_hw, stride_hw


@ENCODER_MODULES.register()
class AddonEncoder(nn.Module):
    """Identity enhancement hook (parity: `/root/reference/cvap/module/val.py:54-61`)."""

    @nn.compact
    def __call__(self, x, **kwargs):
        return x


@ENCODER_MODULES.register()
class CLIPMisc(nn.Module):
    """Parameter container: positional + class embeddings.

    ``stored_grid`` is the grid the parameters are materialized at;
    ``target_grid`` the grid the tower runs at. When they differ (siamese
    sharing of an image-grid pos-emb by the audio tower), the embedding is
    bilinearly re-gridded inside the forward — the jnp analogue of the
    reference's lazy ``pos_embedding`` property
    (`/root/reference/cvap/module/val.py:83-89`, `:524-556`).
    """

    width: int
    stored_grid: Optional[Tuple[int, int]] = None  # None → sequence mode (text)
    target_grid: Optional[Tuple[int, int]] = None
    seq_len: int = 0  # sequence mode length (text ctx)
    param_dtype: Dtype = jnp.float32

    def positions(self) -> int:
        if self.stored_grid is None:
            return self.seq_len
        return int(np.prod(self.stored_grid)) + 1

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        scale = self.width ** -0.5
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=scale),
            (self.positions(), self.width),
            self.param_dtype,
        )
        if self.stored_grid is None:
            return pos, None
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=scale),
            (self.width,),
            self.param_dtype,
        )
        tgt = self.target_grid or self.stored_grid
        pos = interp_pos_grid(pos, self.stored_grid, tgt, n_prefix=1)
        return pos, cls


@ENCODER_MODULES.register()
class ViTPreEncoder(nn.Module):
    """Patchify via conv (no bias) + class token + pos-emb + ln_pre.

    Handles 1-channel log-mel input against a 3-channel kernel by runtime
    mean-collapse — the reference's visual-knowledge-transfer trick
    (`/root/reference/cvap/module/val.py:240-247`).
    """

    width: int
    patch_size: Tuple[int, int]
    stride: Tuple[int, int]
    in_channels: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_embedding: jnp.ndarray,
        class_embedding: jnp.ndarray,
    ) -> jnp.ndarray:
        """x: [B, C, H, W] (NCHW at the API, matching the data layout) →
        [B, 1+grid, width]."""
        assert x.ndim == 4, f"expected 4-d input, got {x.shape}"
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.patch_size, self.in_channels, self.width),
            self.param_dtype,
        )
        if x.shape[1] != kernel.shape[2]:  # channel mismatch → mean-collapse
            kernel = jnp.mean(kernel, axis=2, keepdims=True)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        # im2col + one big matmul instead of a conv: the contraction is the
        # full ph·pw·C patch (MXU-efficient even for 1-channel log-mel
        # input, where a direct conv would contract over C=1)
        from ..ops.patches import patchify_embed

        x = patchify_embed(
            x, kernel.astype(self.dtype), to_2tuple(self.patch_size),
            to_2tuple(self.stride if self.stride is not None else self.patch_size),
        )
        B = x.shape[0]
        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype)[None, None, :], (B, 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embedding[: x.shape[1]].astype(self.dtype)
        return LayerNorm(param_dtype=self.param_dtype, name="ln")(x)


@ENCODER_MODULES.register()
class ViTPostEncoder(nn.Module):
    """ln_post on the class token + linear projection to the joint space.
    ``require_feature`` additionally returns the ln'd grid feature map for
    the captioning decoder (parity: `/root/reference/cvap/module/val.py:261-290`)."""

    width: int
    embed_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        require_feature: bool = False,
        grid: Optional[Tuple[int, int]] = None,
    ):
        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width, self.embed_dim),
            self.param_dtype,
        )
        ln = LayerNorm(param_dtype=self.param_dtype, name="ln")
        if require_feature:
            x = ln(x)
            emb = x[:, 0, :] @ proj.astype(x.dtype)
            feature = x[:, 1:]
            if grid is not None:
                B, _, D = feature.shape
                feature = feature.reshape(B, grid[0], grid[1], D)
            return emb, feature
        x = ln(x[:, 0, :])
        return x @ proj.astype(x.dtype)


@ENCODER_MODULES.register()
class GPTPreEncoder(nn.Module):
    """Token embedding + positional embedding; also derives the EOT index
    (argmax of ids — EOT is the largest token id) for the post encoder
    (parity: `/root/reference/cvap/module/val.py:95-122`)."""

    vocab_size: int
    width: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, ids: jnp.ndarray, pos_embedding: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.vocab_size, self.width),
            self.param_dtype,
        )
        eot_idx = jnp.argmax(ids, axis=-1)
        x = emb[ids].astype(self.dtype)
        x = x + pos_embedding[: x.shape[1]].astype(self.dtype)
        return x, eot_idx


@ENCODER_MODULES.register()
class GPTPostEncoder(nn.Module):
    """Final LN + gather the EOT position + projection
    (parity: `/root/reference/cvap/module/val.py:124-146`)."""

    width: int
    embed_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, eot_idx: jnp.ndarray) -> jnp.ndarray:
        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width, self.embed_dim),
            self.param_dtype,
        )
        x = LayerNorm(param_dtype=self.param_dtype, name="ln")(x)
        x = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
        return x @ proj.astype(x.dtype)


@ENCODER_MODULES.register()
class TransformerBackbone(nn.Module):
    """Shared transformer trunk; ``use_attn_mask`` enables the causal text
    mask (parity: `/root/reference/cvap/module/val.py:468-494` — config flag
    ``skip_attn_mask`` inverted)."""

    layers: int
    width: int
    heads: int
    use_attn_mask: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    # layer-stacked trunk: params live [L, ...] so a `pipe` mesh axis can
    # shard whole layers (GPipe pipeline parallelism, parallel/pipeline.py)
    stacked: bool = False
    pipe_microbatches: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip_attn_mask: Optional[bool] = None,
        attn_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        use_mask = self.use_attn_mask if skip_attn_mask is None else not skip_attn_mask
        mask = causal_mask(x.shape[1]) if use_mask else None
        if attn_bias is not None:
            # constant additive bias (e.g. the token-pack block-diagonal
            # mask) composes with the causal mask by addition
            mask = attn_bias if mask is None else mask + attn_bias
        if self.stacked:
            return StackedTransformer(
                layers=self.layers,
                num_heads=self.heads,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                remat=self.remat,
                pipe_microbatches=self.pipe_microbatches,
                name="transformer",
            )(x, mask=mask)
        return Transformer(
            layers=self.layers,
            num_heads=self.heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            remat=self.remat,
            name="transformer",
        )(x, mask=mask)
