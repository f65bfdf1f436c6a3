"""Loss heads.

Training-time losses as pure flax modules; evaluation metrics live in
:mod:`vipant_tpu.eval.metrics` (the reference folded eval-feature
accumulation into loss-head instance state,
`/root/reference/cvap/module/decoder/loss_head.py:34-46` — in a functional
JAX design the trainers collect features and call the metric suite).

Contrastive batch semantics: losses are written over the *global* batch.
Under ``jit`` with batch inputs sharded along the data mesh axis, XLA
inserts the all-gather for the similarity matrix — giving global negatives
at any scale, i.e. the reference's ``dp``-mode math
(`/root/reference/cvap/model/cvap.py:28-39`) without its single-host limit;
its ``ddp`` mode only had per-rank negatives (SURVEY.md §2.8).

Registry parity: CELossHead, BarlowLossHead, BarlowCELossHead,
ClassificationHead, VALCELossHead, VACELossHead
(`/root/reference/cvap/module/decoder/loss_head.py`), BCELossHead,
BCHingeLossHead, ImagineAndClassifyLossHead, LMLossHead
(`/root/reference/cvap/module/decoder/loss_more.py`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils import Registry
from .layers import LayerNorm

Dtype = Any

LOSS_HEADS = Registry("LOSS_HEADS")

LOGIT_SCALE_INIT = float(np.log(1.0 / 0.07))


def l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over int labels; computed in fp32."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


class _ScaleMixin:
    def _logit_scale(self) -> jnp.ndarray:
        if self.scaling:
            s = self.param(
                "logit_scale",
                lambda key: jnp.asarray(LOGIT_SCALE_INIT, jnp.float32),
            )
        else:
            s = jnp.asarray(0.0, jnp.float32)
        s = jnp.exp(s)
        # `is not None`: scale_max=0.0 must clamp, not silently disable
        if getattr(self, "scale_max", None) is not None:
            s = jnp.minimum(s, self.scale_max)
        return s


@LOSS_HEADS.register()
class CELossHead(nn.Module, _ScaleMixin):
    """Symmetric InfoNCE over the similarity matrix with a learnable
    temperature (init log 1/0.07, optional clamp) — the core training loss
    (parity: `/root/reference/cvap/module/decoder/loss_head.py:246-284`)."""

    scaling: bool = True
    scale_max: Optional[float] = 100.0

    @nn.compact
    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, normalized: bool = False
    ) -> jnp.ndarray:
        if not normalized:
            x1, x2 = l2_normalize(x1), l2_normalize(x2)
        scale = self._logit_scale()
        logits = scale * jnp.einsum(
            "id,jd->ij", x1, x2, preferred_element_type=jnp.float32
        )
        labels = jnp.arange(x1.shape[0])
        return cross_entropy(logits, labels) + cross_entropy(logits.T, labels)


class _MLPChain(nn.Module):
    """(LayerNorm → Dense)* chain used by BCE/Imagine heads
    (layout parity: `/root/reference/cvap/module/decoder/loss_more.py:35-46`)."""

    sizes: Sequence[int]
    final_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.sizes)
        for i, size in enumerate(self.sizes):
            x = LayerNorm(name=f"ln_{i}")(x)
            x = nn.Dense(
                size, use_bias=(self.final_bias or i < n - 1), name=f"dense_{i}"
            )(x)
        return x


@LOSS_HEADS.register()
class ClassificationHead(nn.Module, _ScaleMixin):
    """LayerNorm+Linear CE classifier; predictions for eval
    (parity: `/root/reference/cvap/module/decoder/loss_head.py:330-419`)."""

    num_labels: int = 0
    scaling: bool = True
    scale_max: Optional[float] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, labels: Optional[jnp.ndarray] = None, train: bool = True
    ):
        h = LayerNorm(name="ln")(x)
        logits = nn.Dense(self.num_labels, name="linear")(h)
        if not train:
            return logits
        scale = self._logit_scale()
        return cross_entropy(scale * logits, labels)


@LOSS_HEADS.register()
class BCELossHead(nn.Module, _ScaleMixin):
    """Multi-label BCE with an (optional) MLP on top of the embedding
    (parity: `/root/reference/cvap/module/decoder/loss_more.py:29-143`)."""

    num_labels: int = 0
    layers: Sequence[int] = ()
    scaling: bool = True
    scale_max: Optional[float] = None
    bias: bool = False

    def logits(self, x: jnp.ndarray) -> jnp.ndarray:
        sizes = list(self.layers) + [self.num_labels]
        h = _MLPChain(sizes=sizes, final_bias=self.bias, name="mlp")(x)
        return self._logit_scale() * h

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray, train: bool = True):
        logits = self.logits(x)
        if not train:
            return jax.nn.sigmoid(logits)
        labels = labels.astype(jnp.float32)
        logits = logits.astype(jnp.float32)
        # BCE-with-logits, mean over all elements
        per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return jnp.mean(per)


@LOSS_HEADS.register()
class BCHingeLossHead(nn.Module, _ScaleMixin):
    """Multi-label margin loss over sigmoided logits
    (parity: `/root/reference/cvap/module/decoder/loss_more.py:145-198`,
    torch ``MultiLabelMarginLoss`` semantics re-expressed on the binary
    label matrix)."""

    num_labels: int = 0
    layers: Sequence[int] = ()
    scaling: bool = True
    scale_max: Optional[float] = None
    bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray, train: bool = True):
        sizes = list(self.layers) + [self.num_labels]
        h = _MLPChain(sizes=sizes, final_bias=self.bias, name="mlp")(x)
        scores = jax.nn.sigmoid(self._logit_scale() * h).astype(jnp.float32)
        if not train:
            return scores
        pos = labels.astype(bool)
        # pairwise hinge: for each (pos j, neg k): max(0, 1 - (s_j - s_k))
        diff = scores[:, :, None] - scores[:, None, :]  # [B, j, k] = s_j - s_k
        hinge = jnp.maximum(0.0, 1.0 - diff)
        mask = pos[:, :, None] & (~pos[:, None, :])
        per_sample = jnp.sum(hinge * mask, axis=(1, 2)) / scores.shape[-1]
        return jnp.mean(per_sample)


@LOSS_HEADS.register()
class BarlowLossHead(nn.Module):
    """Barlow Twins: projector MLP (Dense+BN+ReLU) + standardized
    cross-correlation; identity-matching loss
    (parity: `/root/reference/cvap/module/decoder/loss_head.py:286-328`;
    the reference's DDP ``all_reduce(c)`` becomes global-batch math under
    sharded jit)."""

    embed_dim: int
    layers: Sequence[int] = (2048, 4096, 4096)
    lambd_off: float = 0.0051

    @nn.compact
    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = True, normalized: bool = False
    ):
        # `normalized` accepted for loss-head API uniformity; Barlow
        # standardizes features itself (parity with the reference's
        # kwargs-tolerant forward, loss_head.py:304)
        sizes = [self.embed_dim] + list(self.layers)
        denses = [
            nn.Dense(sizes[i + 1], use_bias=False, name=f"dense_{i}")
            for i in range(len(sizes) - 1)
        ]
        bns = [
            nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")
            for i in range(len(sizes) - 2)
        ]

        def project(x):
            for dense, bn in zip(denses[:-1], bns):
                x = nn.relu(bn(dense(x)))
            return denses[-1](x)

        z1, z2 = project(x1), project(x2)
        # affine-free standardization over the (global) batch
        std = lambda z: (z - z.mean(0)) / (z.std(0) + 1e-5)
        n = z1.shape[0]
        c = (std(z1).T @ std(z2)) / n
        on_diag = jnp.sum((jnp.diagonal(c) - 1.0) ** 2)
        off_diag = jnp.sum(c ** 2) - jnp.sum(jnp.diagonal(c) ** 2)
        return on_diag + self.lambd_off * off_diag


@LOSS_HEADS.register()
class BarlowCELossHead(nn.Module):
    """CE + λ·Barlow (parity: `/root/reference/cvap/module/decoder/loss_head.py:600-622`)."""

    embed_dim: int
    lambd_barlow: float = 0.05
    barlow_layers: Sequence[int] = (2048, 4096, 4096)
    lambd_off: float = 0.0051
    scaling: bool = True
    scale_max: Optional[float] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True, normalized: bool = False):
        ce = CELossHead(scaling=self.scaling, scale_max=self.scale_max, name="ce")(
            x1, x2, normalized=normalized
        )
        barlow = BarlowLossHead(
            embed_dim=self.embed_dim,
            layers=self.barlow_layers,
            lambd_off=self.lambd_off,
            name="barlow",
        )(x1, x2, train=train)
        return ce + self.lambd_barlow * barlow


@LOSS_HEADS.register()
class VALCELossHead(nn.Module):
    """Weighted pairwise CE for trimodal V-A-L; each active pair has its own
    temperature (parity: `/root/reference/cvap/module/decoder/loss_head.py:421-495`)."""

    va: bool = True
    lv: bool = False
    al: bool = True
    va_w: float = 1.0
    lv_w: float = 1.0
    al_w: float = 1.0
    scaling: bool = True
    scale_max: Optional[float] = None

    @nn.compact
    def __call__(
        self,
        v: Optional[jnp.ndarray],
        a: Optional[jnp.ndarray],
        l: Optional[jnp.ndarray],
        normalized: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        total = jnp.asarray(0.0, jnp.float32)
        aux: Dict[str, jnp.ndarray] = {}
        mk = lambda name: CELossHead(
            scaling=self.scaling, scale_max=self.scale_max, name=name
        )
        if self.va and v is not None and a is not None:
            aux["va"] = mk("ce_va")(v, a, normalized=normalized)
            total = total + self.va_w * aux["va"]
        if self.lv and v is not None and l is not None:
            aux["lv"] = mk("ce_lv")(v, l, normalized=normalized)
            total = total + self.lv_w * aux["lv"]
        if self.al and a is not None and l is not None:
            aux["al"] = mk("ce_al")(a, l, normalized=normalized)
            total = total + self.al_w * aux["al"]
        return total, aux


@LOSS_HEADS.register()
class VACELossHead(nn.Module):
    """5-way multi-view CE for siamese VA training: vp (view-pivot), ap,
    va, vv, aa combinations with weights
    (parity: `/root/reference/cvap/module/decoder/loss_head.py:497-598`)."""

    vp: bool = True
    ap: bool = False
    va: bool = True
    vv: bool = True
    aa: bool = False
    vp_w: float = 1.0
    ap_w: float = 1.0
    va_w: float = 1.0
    vv_w: float = 1.0
    aa_w: float = 1.0
    scaling: bool = True
    scale_max: Optional[float] = None

    @nn.compact
    def __call__(
        self,
        v_pivot: Optional[jnp.ndarray],
        v1: Optional[jnp.ndarray],
        a1: Optional[jnp.ndarray],
        v2: Optional[jnp.ndarray] = None,
        a2: Optional[jnp.ndarray] = None,
        normalized: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        total = jnp.asarray(0.0, jnp.float32)
        aux: Dict[str, jnp.ndarray] = {}
        mk = lambda name: CELossHead(
            scaling=self.scaling, scale_max=self.scale_max, name=name
        )
        pairs = [
            ("vp", self.vp, self.vp_w, v1, v_pivot),
            ("ap", self.ap, self.ap_w, a1, v_pivot),
            ("va", self.va, self.va_w, v1, a1),
            ("vv", self.vv, self.vv_w, v1, v2),
            ("aa", self.aa, self.aa_w, a1, a2),
        ]
        for name, alive, w, x, y in pairs:
            if alive and x is not None and y is not None:
                aux[name] = mk(f"ce_{name}")(x, y, normalized=normalized)
                total = total + w * aux[name]
        return total, aux


@LOSS_HEADS.register()
class ImagineAndClassifyLossHead(nn.Module):
    """BCE classification + λ·CE "imagination" (audio→image alignment via an
    a2v MLP) (parity: `/root/reference/cvap/module/decoder/loss_more.py:200-274`)."""

    num_labels: int
    embed_dim: int
    lambd_ce: float = 1.0
    a2v_layers: Sequence[int] = ()
    bias: bool = False
    use_ce: bool = True
    use_bce: bool = True
    scaling: bool = True
    scale_max: Optional[float] = None
    # nested BCE sub-head settings (the reference builds it fully from
    # cfg.bce, `/root/reference/cvap/module/decoder/loss_more.py:210-212`)
    bce_layers: Sequence[int] = ()
    bce_scaling: Optional[bool] = None  # None -> follow `scaling`
    bce_scale_max: Optional[float] = None

    @nn.compact
    def __call__(
        self,
        audio: jnp.ndarray,
        labels: jnp.ndarray,
        image: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        bce_head = (
            BCELossHead(
                num_labels=self.num_labels,
                layers=tuple(self.bce_layers),
                scaling=self.scaling if self.bce_scaling is None else self.bce_scaling,
                scale_max=self.bce_scale_max,
                bias=self.bias,
                name="bce",
            )
            if self.use_bce
            else None
        )
        if not train:  # eval: multi-label sigmoid scores
            if bce_head is None:
                # the reference's ce-only infer accumulates audio↔image
                # retrieval through its stateful CE head
                # (`loss_more.py:247-255`); here that evaluation runs
                # through the encoder/zero-shot paths (ASMonitor
                # zero_shot/encode dumps) — the multilabel report needs the
                # BCE branch
                raise ValueError(
                    "ImagineAndClassifyLossHead eval needs bce.alive=True "
                    "(multi-label scores); for the ce-only imagination "
                    "branch use the retrieval/zero-shot eval paths"
                )
            return bce_head(audio, labels, train=False)
        total = jnp.asarray(0.0, jnp.float32)
        aux: Dict[str, jnp.ndarray] = {}
        if self.use_ce and image is not None:
            imagined = audio
            if len(self.a2v_layers) > 0:
                imagined = _MLPChain(
                    sizes=list(self.a2v_layers), final_bias=self.bias, name="a2v"
                )(audio)
            aux["ce"] = CELossHead(
                scaling=self.scaling, scale_max=self.scale_max, name="ce"
            )(imagined, image)
            total = total + self.lambd_ce * aux["ce"]
        if bce_head is not None:
            aux["bce"] = bce_head(audio, labels, train=True)
            total = total + aux["bce"]
        return total, aux


@LOSS_HEADS.register()
class LMLossHead(nn.Module, _ScaleMixin):
    """Captioning CE over decoder logits, pad (id 0) ignored. The decoder
    logits are multiplied by a learnable exp(logit_scale) (init log 1/0.07,
    no clamp) before CE when ``scaling`` — the reference's LM head does the
    same and its released checkpoints carry the parameter
    (parity: `/root/reference/cvap/module/decoder/loss_more.py:276-387`,
    the scale applied at `:375-376`)."""

    scaling: bool = True
    scale_max: Optional[float] = None

    @nn.compact
    def __call__(self, logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        logits = self._logit_scale() * logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        mask = (targets != 0).astype(jnp.float32)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def build_loss_head(cfg, **kwargs):
    """Config → loss head module (parity:
    `/root/reference/cvap/module/decoder/loss_head.py:17-27` factory)."""
    name = cfg.name
    if name == "CELossHead":
        return CELossHead(scaling=bool(cfg.get("scaling", True)), scale_max=cfg.get("scale_max"))
    if name == "ClassificationHead":
        return ClassificationHead(
            num_labels=kwargs["output_dim"], scaling=bool(cfg.get("scaling", True))
        )
    if name == "BCELossHead":
        return BCELossHead(
            num_labels=kwargs["output_dim"],
            layers=tuple(cfg.get("layers", []) or []),
            scaling=bool(cfg.get("scaling", True)),
            bias=bool(cfg.get("bias", False)),
        )
    if name == "BCHingeLossHead":
        return BCHingeLossHead(
            num_labels=kwargs["output_dim"],
            layers=tuple(cfg.get("layers", []) or []),
            scaling=bool(cfg.get("scaling", True)),
            bias=bool(cfg.get("bias", False)),
        )
    if name == "BarlowLossHead":
        return BarlowLossHead(
            embed_dim=int(cfg.embed_dim),
            layers=tuple(cfg.layers),
            lambd_off=float(cfg.lambd_off),
        )
    if name == "BarlowCELossHead":
        return BarlowCELossHead(
            embed_dim=int(cfg.barlow.embed_dim),
            lambd_barlow=float(cfg.lambd_barlow),
            barlow_layers=tuple(cfg.barlow.layers),
            lambd_off=float(cfg.barlow.lambd_off),
            scaling=bool(cfg.ce.get("scaling", True)),
            scale_max=cfg.ce.get("scale_max"),
        )
    if name == "VALCELossHead":
        return VALCELossHead(
            va=bool(cfg.get("va", True)),
            lv=bool(cfg.get("lv", False)),
            al=bool(cfg.get("al", True)),
            va_w=float(cfg.get("va_w", 1.0)),
            lv_w=float(cfg.get("lv_w", 1.0)),
            al_w=float(cfg.get("al_w", 1.0)),
            scaling=bool(cfg.get("scaling", True)),
            scale_max=cfg.get("scale_max"),
        )
    if name == "VACELossHead":
        return VACELossHead(
            vp=bool(cfg.get("vp", True)),
            ap=bool(cfg.get("ap", False)),
            va=bool(cfg.get("va", True)),
            vv=bool(cfg.get("vv", True)),
            aa=bool(cfg.get("aa", False)),
            vp_w=float(cfg.get("vp_w", 1.0)),
            ap_w=float(cfg.get("ap_w", 1.0)),
            va_w=float(cfg.get("va_w", 1.0)),
            vv_w=float(cfg.get("vv_w", 1.0)),
            aa_w=float(cfg.get("aa_w", 1.0)),
            scaling=bool(cfg.get("scaling", True)),
            scale_max=cfg.get("scale_max"),
        )
    if name == "ImagineAndClassifyLossHead":
        return ImagineAndClassifyLossHead(
            num_labels=kwargs["output_dim"],
            embed_dim=int(cfg.bce.embed_dim),
            lambd_ce=float(cfg.lambd_ce),
            a2v_layers=tuple(int(v) for v in cfg.get("layers", []) or []),
            bias=bool(cfg.get("bias", False)),
            use_ce=bool(cfg.ce.get("alive", True)),
            use_bce=bool(cfg.bce.get("alive", True)),
            scaling=bool(cfg.ce.get("scaling", True)),
            scale_max=cfg.ce.get("scale_max"),
            bce_layers=tuple(int(v) for v in cfg.bce.get("layers", []) or []),
            bce_scaling=bool(cfg.bce.get("scaling", True)),
            bce_scale_max=cfg.bce.get("scale_max"),
        )
    if name == "LMLossHead":
        return LMLossHead(scaling=bool(cfg.get("scaling", True)))
    if name == "DummyHead":
        from .heads import DummyHead

        return DummyHead()
    raise KeyError(f"unknown loss head {name!r}")
