"""Encoder towers ("heads") composed from MetaHead stages, plus registries.

Registry parity with the reference's head layer
(`/root/reference/cvap/module/encoder/__init__.py:1-10`): ``IMAGE_HEADS``,
``AUDIO_HEADS``, ``TEXT_HEADS`` select a tower class by config name; a
``DummyHead`` registered everywhere lets any tower be disabled by config
(`/root/reference/cvap/module/__init__.py:21-36`).

Towers are pure flax modules; cross-tower parameter sharing (siamese mode)
is expressed at the parameter-pytree level via :mod:`vipant_tpu.nn.tying`
rather than object aliasing — the JAX-native equivalent of the reference's
``replace_modules``/``keep_hp`` machinery
(`/root/reference/cvap/module/encoder/clip_head.py:71-96`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils import Registry
from .layers import pack_tokens
from .resnet import ResNetBackbone, ResNetPostEncoder, ResNetPreEncoder, resnet_grid
from .stages import (
    AddonEncoder,
    CLIPMisc,
    GPTPostEncoder,
    GPTPreEncoder,
    TransformerBackbone,
    ViTPostEncoder,
    ViTPreEncoder,
    to_2tuple,
    vit_grid,
)

Dtype = Any

IMAGE_HEADS = Registry("IMAGE_HEADS")
AUDIO_HEADS = Registry("AUDIO_HEADS")
TEXT_HEADS = Registry("TEXT_HEADS")


def normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    # eps: an all-zero row (zero-padded eval rows, a missing precomputed
    # embedding) must yield zeros, not 0/0 = NaN that poisons the whole
    # batch's contrastive gradients; real embeddings have norm >> eps
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-8)


class VisionTower(nn.Module):
    """ViT- or ResNet-backboned image/audio tower.

    The audio tower is this same module run over the [1, T, M] log-mel
    "image" with a rectangular grid and overlapping stride — the core
    visual-transfer design of the reference
    (`/root/reference/cvap/module/encoder/audio_head.py:136-212`).

    ``misc_stored_grid``: grid at which positional embeddings are stored.
    Defaults to the tower's own grid; set to another tower's grid when the
    pos-emb params are tied to it (siamese), in which case the forward
    re-grids on the fly.
    """

    width: int
    embed_dim: int
    resolution: Any  # int or (H, W)
    heads: int
    layers: Any  # int (transformer depth) or sequence (resnet stage depths)
    patch_size: Any = 32
    stride: Any = None
    in_channels: int = 3
    backbone: str = "transformer"  # "transformer" | "resnet"
    misc_stored_grid: Optional[Tuple[int, int]] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    # Patchout (PaSST, arXiv 2211.13956 / FLAP, arXiv 2311.01615): drop a
    # random fraction of patch tokens during training — a regularizer that
    # also cuts transformer FLOPs roughly by the drop rate. Static shapes:
    # the keep-count is fixed at trace time.
    patchout: float = 0.0
    # layer-stacked trunk for pipeline parallelism (parallel/pipeline.py)
    stacked: bool = False
    pipe_microbatches: Optional[int] = None
    # Token packing: run K items per attention call with a block-diagonal
    # additive mask — EXACT (softmax rows never mix items; LN/MLP are
    # token-wise), but short sequences stop wasting MXU lane tiles on the
    # TT-oriented qkv projections (T=50 pads to 128 lanes; 4·50=200 pads to
    # 256 — measured 3.2× faster attention chain for the frozen T=50 image
    # tower, experiments/pack_probe.py). Counterproductive for T near the
    # tile boundary (audio T=306→384); keep 1 there.
    token_pack: int = 1
    # Run this tower's trunk on the fwd-only int8-MXU kernels (weights
    # per-channel / activations per-token, quantized in VMEM — ops/quant.py).
    # For FROZEN towers only: their output is constant w.r.t. the trainable
    # params, so AD never needs a VJP through them; a tunable tower with
    # this flag fails loudly at trace time. A training-recipe knob (the
    # embeddings move by cosine ~1e-4, like the reference's fp16 autocast
    # did, `/root/reference/cvap/monitor/cvap.py:104`); TPU-only, no-op on
    # other backends.
    int8_frozen: bool = False

    @property
    def grid(self) -> Tuple[int, int]:
        if self.backbone == "resnet":
            return resnet_grid(self.resolution)
        g, _, _ = vit_grid(self.resolution, self.patch_size, self.stride)
        return g

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        require_feature: bool = False,
        normalized: bool = False,
    ):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.backbone == "resnet":
            # these knobs are ViT-only paths below; silently ignoring them
            # would run different training semantics than configured
            for knob in ("patchout", "token_pack", "int8_frozen"):
                if getattr(self, knob, None):
                    raise ValueError(f"{knob} is not supported on the resnet backbone")
            h = ResNetPreEncoder(
                width=self.width, in_channels=self.in_channels, name="pre", **kw
            )(x, train=train)
            h = AddonEncoder(name="pre_addon")(h)
            h = ResNetBackbone(
                layers=tuple(self.layers), width=self.width, name="encoder", **kw
            )(h, train=train)
            h = AddonEncoder(name="post_addon")(h)
            emb = ResNetPostEncoder(
                embed_dim=self.width * 32,
                output_dim=self.embed_dim,
                heads=self.heads,
                stored_grid=self.misc_stored_grid or self.grid,
                name="post",
                **kw,
            )(h, train=train)
            if require_feature:
                raise NotImplementedError("require_feature is ViT-only")
            return normalize(emb) if normalized else emb

        grid, patch_hw, stride_hw = vit_grid(self.resolution, self.patch_size, self.stride)
        pos, cls = CLIPMisc(
            width=self.width,
            stored_grid=self.misc_stored_grid or grid,
            target_grid=grid,
            param_dtype=self.param_dtype,
            name="misc",
        )()
        h = ViTPreEncoder(
            width=self.width,
            patch_size=patch_hw,
            stride=stride_hw,
            in_channels=self.in_channels,
            name="pre",
            **kw,
        )(x, pos, cls)
        if train and self.patchout > 0.0 and self.has_rng("patchout"):
            if require_feature:
                # the captioning decoder's memory (require_feature) is the
                # FULL grid reshape (ViTPostEncoder); a post-patchout token
                # set cannot fill it — fail loud instead of a trace-time
                # reshape error deep inside the post stage
                raise ValueError(
                    "patchout is incompatible with require_feature "
                    "(captioning decoder memory needs the full patch grid) — "
                    "set model.audio.patchout=0 for captioning configs"
                )
            n = h.shape[1] - 1  # patch tokens (cls excluded)
            keep = max(int(n * (1.0 - self.patchout)), 1)
            rng = self.make_rng("patchout")
            # one shared subset per batch (PaSST's structured variant keeps
            # shapes static and the gather cheap)
            idx = jax.random.permutation(rng, n)[:keep] + 1
            idx = jnp.sort(idx)
            h = jnp.concatenate([h[:, :1], jnp.take(h, idx, axis=1)], axis=1)
        h = AddonEncoder(name="pre_addon")(h)
        k = int(self.token_pack or 1)
        pack = k > 1 and h.shape[0] % k == 0
        attn_bias = None
        if pack:
            B_full, Tt, _ = h.shape
            h, attn_bias = pack_tokens(h, k)
        import contextlib

        from ..ops.quant import int8_fwd_context

        int8_ctx = (
            int8_fwd_context()
            if self.int8_frozen and jax.default_backend() == "tpu"
            else contextlib.nullcontext()
        )
        with int8_ctx:
            h = TransformerBackbone(
                layers=int(self.layers),
                width=self.width,
                heads=self.heads,
                use_attn_mask=False,
                remat=self.remat,
                stacked=self.stacked,
                pipe_microbatches=self.pipe_microbatches,
                name="encoder",
                **kw,
            )(h, attn_bias=attn_bias)
        if pack:
            h = h.reshape(B_full, Tt, h.shape[-1])
        h = AddonEncoder(name="post_addon")(h)
        out = ViTPostEncoder(
            width=self.width, embed_dim=self.embed_dim, name="post", **kw
        )(h, require_feature=require_feature, grid=grid)
        if require_feature:
            emb, feat = out
            return (normalize(emb) if normalized else emb), feat
        return normalize(out) if normalized else out


class TextTower(nn.Module):
    """GPT-style causal text tower with EOT pooling
    (parity: `/root/reference/cvap/module/encoder/text_head.py:22-45` +
    `/root/reference/cvap/module/txt.py`)."""

    width: int
    embed_dim: int
    vocab_size: int = 49408
    ctx_len: int = 77
    heads: int = 8
    layers: int = 12
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    stacked: bool = False
    pipe_microbatches: Optional[int] = None
    # pack K captions per attention call (block-diagonal + causal mask =
    # per-segment causal, exact) — T=77 pads to 128 lanes; measured −22%
    # attention chain at serving batches (docs/performance.md round-3)
    token_pack: int = 1

    @nn.compact
    def __call__(
        self, ids: jnp.ndarray, train: bool = False, normalized: bool = False
    ) -> jnp.ndarray:
        pos, _ = CLIPMisc(
            width=self.width,
            stored_grid=None,
            seq_len=self.ctx_len,
            param_dtype=self.param_dtype,
            name="misc",
        )()
        h, eot_idx = GPTPreEncoder(
            vocab_size=self.vocab_size,
            width=self.width,
            name="pre",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(ids, pos)
        h = AddonEncoder(name="pre_addon")(h)
        k = int(self.token_pack or 1)
        pack = k > 1 and h.shape[0] % k == 0
        attn_bias = None
        if pack:
            B_full, Tt, _ = h.shape
            h, attn_bias = pack_tokens(h, k)
        h = TransformerBackbone(
            layers=self.layers,
            width=self.width,
            heads=self.heads,
            use_attn_mask=True,
            remat=self.remat,
            stacked=self.stacked,
            pipe_microbatches=self.pipe_microbatches,
            name="encoder",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(h, attn_bias=attn_bias)
        if pack:
            h = h.reshape(B_full, Tt, h.shape[-1])
        h = AddonEncoder(name="post_addon")(h)
        emb = GPTPostEncoder(
            width=self.width,
            embed_dim=self.embed_dim,
            name="post",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(h, eot_idx)
        return normalize(emb) if normalized else emb


class DummyHead(nn.Module):
    """Disabled tower: passes features through unchanged
    (parity: `/root/reference/cvap/module/__init__.py:21-36`)."""

    @nn.compact
    def __call__(self, x, **kwargs):
        return x


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def _common(cfg, dtype, param_dtype, remat):
    return dict(dtype=dtype, param_dtype=param_dtype, remat=remat)


def _vision_from_cfg(cfg, dtype, param_dtype, remat) -> VisionTower:
    enc_name = cfg.encoder.name
    backbone = "resnet" if enc_name == "ResNetBackbone" else "transformer"
    resolution = cfg.resolution
    if isinstance(resolution, list):
        resolution = tuple(int(v) for v in resolution)
    pre = cfg.pre_encoder
    return VisionTower(
        width=int(cfg.width),
        embed_dim=int(cfg.embed_dim),
        resolution=resolution,
        heads=int(cfg.get("heads", 12)),
        layers=(
            tuple(cfg.encoder.layers)
            if isinstance(cfg.encoder.layers, list)
            else int(cfg.encoder.layers)
        ),
        patch_size=pre.get("patch_size", 32),
        stride=pre.get("stride", None),
        in_channels=int(pre.get("in_channels", 3)),
        backbone=backbone,
        patchout=float(cfg.get("patchout", 0.0) or 0.0),
        stacked=bool(cfg.get("stacked", False)),
        pipe_microbatches=cfg.get("pipe_microbatches", None),
        token_pack=int(cfg.get("token_pack", 1) or 1),
        int8_frozen=bool(cfg.get("int8_frozen", False)),
        **_common(cfg, dtype, param_dtype, remat),
    )


@IMAGE_HEADS.register(name="CLIPImageHead")
def build_clip_image_head(cfg, dtype=jnp.float32, param_dtype=jnp.float32, remat=False):
    return _vision_from_cfg(cfg, dtype, param_dtype, remat)


@AUDIO_HEADS.register(name="CLIPAudioHead")
def build_clip_audio_head(cfg, dtype=jnp.float32, param_dtype=jnp.float32, remat=False):
    return _vision_from_cfg(cfg, dtype, param_dtype, remat)


@AUDIO_HEADS.register(name="NaiveCLIPAudioHead")
def build_naive_clip_audio_head(cfg, dtype=jnp.float32, param_dtype=jnp.float32, remat=False):
    # the legacy non-MetaHead audio tower is architecturally identical here
    return _vision_from_cfg(cfg, dtype, param_dtype, remat)


@TEXT_HEADS.register(name="CLIPTextHead")
def build_clip_text_head(cfg, dtype=jnp.float32, param_dtype=jnp.float32, remat=False):
    return TextTower(
        width=int(cfg.width),
        embed_dim=int(cfg.embed_dim),
        vocab_size=int(cfg.pre_encoder.get("vocab_size", 49408)),
        ctx_len=int(cfg.get("ctx_len", 77)),
        heads=int(cfg.get("heads", 8)),
        layers=int(cfg.encoder.layers),
        dtype=dtype,
        param_dtype=param_dtype,
        remat=remat,
        stacked=bool(cfg.get("stacked", False)),
        pipe_microbatches=cfg.get("pipe_microbatches", None),
        token_pack=int(cfg.get("token_pack", 1) or 1),
    )


# legacy head-name aliases: the reference's pre-MetaHead groups
# (`/root/reference/configs/model/{image/vit,audio/vit,text/transformer}.yaml`)
# name `ImageHead`/`TextHead` (`NaiveCLIPAudioHead` is registered above);
# they resolve to the same consolidated towers
IMAGE_HEADS.register(build_clip_image_head, name="ImageHead")
TEXT_HEADS.register(build_clip_text_head, name="TextHead")


def _build_dummy(cfg, dtype=jnp.float32, param_dtype=jnp.float32, remat=False):
    return DummyHead()


IMAGE_HEADS.register(_build_dummy, name="DummyHead")
AUDIO_HEADS.register(_build_dummy, name="DummyHead")
TEXT_HEADS.register(_build_dummy, name="DummyHead")


def build_image_head(cfg, **kw):
    return IMAGE_HEADS.get(cfg.name)(cfg, **kw)


def build_audio_head(cfg, **kw):
    return AUDIO_HEADS.get(cfg.name)(cfg, **kw)


def build_text_head(cfg, **kw):
    return TEXT_HEADS.get(cfg.name)(cfg, **kw)
