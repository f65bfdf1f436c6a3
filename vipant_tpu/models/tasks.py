"""Task models: compositions of encoder towers and loss heads.

Model registry parity with the reference's ``VAL_MODELS_REGISTRY``
(`/root/reference/cvap/model/__init__.py:12-26`): CVAP, CLAP, CVALP, CVASP,
ASClassifier, ESClassifier, CLVP — selected by ``cfg.worker``.

Design differences from the reference, on purpose:

* Precomputed-feature passthrough is by rank: a 2-d input is treated as an
  already-encoded embedding and (re-)normalized, replacing the reference's
  dummy-tensor sentinels (`/root/reference/cvap/model/cvalp.py:34-62`).
* Disabled towers are ``None`` fields — branch decisions are static at
  trace time, not runtime tensor checks.
* The models carry no device logic: data parallelism comes from sharding
  the batch over the mesh (see :mod:`vipant_tpu.parallel`), which gives the
  reference's ``dp``-mode global-negative semantics at any scale.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.heads import normalize
from ..utils import Registry

MODELS = Registry("MODELS")


def _encode(tower, x, train: bool, require_feature: bool = False):
    """Shared encode helper: *float* rank-2 inputs are precomputed
    embeddings (token-id inputs are integer rank-2 and go through the
    tower)."""
    if x is None:
        return None
    if x.ndim == 2 and not jnp.issubdtype(x.dtype, jnp.integer):
        return normalize(x)
    if require_feature:
        return tower(x, train=train, require_feature=True, normalized=True)
    return tower(x, train=train, normalized=True)


@MODELS.register()
class CVAP(nn.Module):
    """Image↔audio contrastive pre-training
    (parity: `/root/reference/cvap/model/cvap.py`)."""

    image: Any
    audio: Any
    loss: Any

    def encode_image(self, images, train: bool = False):
        return _encode(self.image, images, train)

    def encode_audio(self, audios, train: bool = False):
        return _encode(self.audio, audios, train)

    def __call__(self, images, audios, train: bool = True):
        v = self.encode_image(images, train)
        a = self.encode_audio(audios, train)
        return self.loss(v, a, normalized=True)

    def features(self, images, audios, train: bool = False):
        return self.encode_image(images, train), self.encode_audio(audios, train)


@MODELS.register()
class CLAP(nn.Module):
    """Audio↔text fine-tuning / retrieval / captioning
    (parity: `/root/reference/cvap/model/clap.py`). ``decoder`` is the
    SeqGenerationHead for the captioning branch; ``lm_loss`` its loss."""

    audio: Any
    text: Any
    loss: Any
    decoder: Any = None
    lm_loss: Any = None

    def encode_audio(self, audios, train: bool = False):
        return _encode(self.audio, audios, train)

    def encode_text(self, text, train: bool = False):
        return _encode(self.text, text, train)

    def forward_retrieval(self, audios, text, train: bool = True):
        a = self.encode_audio(audios, train)
        t = self.encode_text(text, train)
        return self.loss(a, t, normalized=True)

    def forward_caption(self, audios, text, train: bool = True):
        assert self.decoder is not None and self.lm_loss is not None
        _, feat = _encode(self.audio, audios, train, require_feature=True)
        _, logits = self.decoder(text, feat, time_first=True)
        return self.lm_loss(logits, text[:, 1:])

    def __call__(self, audios, text, retrieval: Optional[bool] = None, train: bool = True):
        if retrieval is None:  # captioning config has no dual text tower
            retrieval = self.text is not None
        if retrieval:
            return self.forward_retrieval(audios, text, train)
        return self.forward_caption(audios, text, train)

    def decode(self, audios, beam: int = 0):
        """KV-cached decode (O(L) token-forwards): greedy by default,
        beam search with ``beam`` > 1 hypotheses (beyond the reference's
        greedy-only `/root/reference/cvap/module/encoder/text_head.py:80-107`)."""
        _, feat = _encode(self.audio, audios, False, require_feature=True)
        if beam and beam > 1:
            return self.decoder.beam_decode_kv(feat, beam=beam)
        return self.decoder.greedy_decode_kv(feat)

    def features(self, audios, text, train: bool = False):
        return self.encode_audio(audios, train), self.encode_text(text, train)


@MODELS.register()
class CVALP(nn.Module):
    """Trimodal vision-audio-language training
    (parity: `/root/reference/cvap/model/cvalp.py`). Siamese parameter
    sharing is applied outside the module via
    :mod:`vipant_tpu.nn.tying`."""

    image: Any
    audio: Any
    text: Any
    loss: Any

    def encode_image(self, x, train: bool = False):
        return _encode(self.image, x, train)

    def encode_audio(self, x, train: bool = False):
        return _encode(self.audio, x, train)

    def encode_text(self, x, train: bool = False):
        return _encode(self.text, x, train)

    def __call__(self, images, audios, text, train: bool = True):
        v = self.encode_image(images, train)
        a = self.encode_audio(audios, train)
        l = self.encode_text(text, train)
        return self.loss(v, a, l, normalized=True)

    def features(self, images, audios, text, train: bool = False):
        return (
            self.encode_image(images, train),
            self.encode_audio(audios, train),
            self.encode_text(text, train),
        )


@MODELS.register()
class CVASP(nn.Module):
    """Multi-view siamese VA training
    (parity: `/root/reference/cvap/model/siamese_va.py`): a frozen pivot
    image view plus two augmented image/audio views feeding VACELossHead."""

    image: Any  # pivot tower (usually frozen CLIP)
    image_v: Any  # view tower (often tied/shared)
    audio: Any
    loss: Any

    def encode_pivot_image(self, images, train: bool = False):
        return _encode(self.image, images, train)

    def encode_audio_view(self, audios, train: bool = False):
        return _encode(self.audio, audios, train)

    def __call__(
        self,
        images,
        images_v1,
        audios_v1,
        images_v2=None,
        audios_v2=None,
        train: bool = True,
    ):
        vp = _encode(self.image, images, train)
        v1 = _encode(self.image_v, images_v1, train)
        a1 = _encode(self.audio, audios_v1, train)
        v2 = _encode(self.image_v, images_v2, train) if images_v2 is not None else None
        a2 = _encode(self.audio, audios_v2, train) if audios_v2 is not None else None
        return self.loss(vp, v1, a1, v2, a2, normalized=True)


@MODELS.register()
class ASClassifier(nn.Module):
    """AudioSet multi-label classification, optionally with the
    "imagination" CE branch against image features
    (parity: `/root/reference/cvap/model/audioset_clf.py`)."""

    audio: Any
    text: Any = None  # for zero-shot eval
    image: Any = None  # for the imagine branch
    loss: Any = None

    def encode_audio(self, audios, train: bool = False):
        return _encode(self.audio, audios, train)

    def encode_text(self, text, train: bool = False):
        return _encode(self.text, text, train)

    def __call__(self, images, audios, labels, train: bool = True):
        from ..nn.losses import ImagineAndClassifyLossHead

        a = self.audio(audios, train=train)  # raw (unnormalized) for the clf
        if (
            images is not None
            and self.image is not None
            and isinstance(self.loss, ImagineAndClassifyLossHead)
        ):
            v = _encode(self.image, images, train)
            return self.loss(a, labels, v, train=train)
        return self.loss(a, labels, train=train)


@MODELS.register()
class ESClassifier(nn.Module):
    """ESC-50/US8K classification + zero-shot
    (parity: `/root/reference/cvap/model/esc50_clf.py`)."""

    audio: Any
    text: Any = None
    loss: Any = None

    def encode_audio(self, audios, train: bool = False):
        return _encode(self.audio, audios, train)

    def encode_text(self, text, train: bool = False):
        return _encode(self.text, text, train)

    def __call__(self, audios, labels, train: bool = True):
        a = self.audio(audios, train=train)
        return self.loss(a, labels, train=train)

    def predictions(self, audios):
        a = self.audio(audios, train=False)
        return jnp.argmax(self.loss(a, train=False), axis=-1)


@MODELS.register()
class CLVP(nn.Module):
    """Image↔text retrieval, eval-only
    (parity: `/root/reference/cvap/model/clvp.py`)."""

    image: Any
    text: Any
    loss: Any

    def encode_image(self, images, train: bool = False):
        return _encode(self.image, images, train)

    def encode_text(self, text, train: bool = False):
        return _encode(self.text, text, train)

    def __call__(self, images, text, train: bool = False):
        v = self.encode_image(images, train)
        t = self.encode_text(text, train)
        return self.loss(v, t, normalized=True)

    def features(self, images, text, train: bool = False):
        return self.encode_image(images, train), self.encode_text(text, train)
