"""Model assembly: config → module, init, freeze masks, siamese ties,
CLIP-weight porting.

This layer plays the role of the reference's per-model ``build`` methods
(`/root/reference/cvap/model/cvap.py:61-128`, `cvalp.py:130-267`): choose
towers by registry name, initialize from CLIP (audio from the image tower
with grid retarget), decide the tunable parameter set, and wire siamese
parameter sharing (as pytree ties, see :mod:`vipant_tpu.nn.tying`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt.clip_port import port_clip_text, port_clip_visual, split_clip_state_dict
from ..nn.heads import build_audio_head, build_image_head, build_text_head
from ..nn.losses import LOGIT_SCALE_INIT, build_loss_head
from ..nn.seqgen import SeqGenerationHead
from .tasks import MODELS, CVAP, CLAP, CVALP, CVASP, ASClassifier, ESClassifier, CLVP


def _dtypes(cfg):
    dt = jnp.bfloat16 if cfg.get("compute_dtype", "float32") == "bfloat16" else jnp.float32
    return dict(dtype=dt, param_dtype=jnp.float32)


def build_main_model(cfg, output_dim: Optional[int] = None):
    """cfg.worker → composed flax module
    (parity: `/root/reference/cvap/model/__init__.py:12-26`)."""
    worker = cfg.worker
    m = cfg.model
    kw = _dtypes(cfg)
    loss_kwargs = {"output_dim": output_dim} if output_dim is not None else {}

    if worker == "CVAP":
        return CVAP(
            image=build_image_head(m.image, **kw),
            audio=build_audio_head(m.audio, **kw),
            loss=build_loss_head(m.loss, **loss_kwargs),
        )
    if worker == "CLAP":
        decoder = lm_loss = None
        if m.text.name == "SeqGenerationHead":
            decoder = SeqGenerationHead(
                width=int(m.text.width),
                layers=int(m.text.layers),
                heads=int(m.text.heads),
                ctx_len=int(m.text.ctx_len),
                vocab_size=int(m.text.vocab_size),
                embed_dim=int(m.text.embed_dim),
                mem_width=int(m.text.mem_width),
                max_len_dec=int(m.text.max_len_dec),
                bias=bool(m.text.bias),
                **kw,
            )
            lm_loss = build_loss_head(m.loss)
            text = None
        else:
            text = build_text_head(m.text, **kw)
        return CLAP(
            audio=build_audio_head(m.audio, **kw),
            text=text,
            loss=build_loss_head(m.loss, **loss_kwargs)
            if m.loss.name != "LMLossHead"
            else None,
            decoder=decoder,
            lm_loss=lm_loss,
        )
    if worker == "CVALP":
        return CVALP(
            image=build_image_head(m.image, **kw),
            audio=build_audio_head(m.audio, **kw),
            text=build_text_head(m.text, **kw),
            loss=build_loss_head(m.loss, **loss_kwargs),
        )
    if worker == "CVASP":
        return CVASP(
            image=build_image_head(m.image, **kw),
            image_v=build_image_head(m.image, **kw),
            audio=build_audio_head(m.audio, **kw),
            loss=build_loss_head(m.loss, **loss_kwargs),
        )
    if worker == "ASClassifier":
        return ASClassifier(
            audio=build_audio_head(m.audio, **kw),
            text=build_text_head(m.text, **kw) if "text" in m else None,
            image=build_image_head(m.image, **kw) if "image" in m else None,
            loss=build_loss_head(m.loss, **loss_kwargs),
        )
    if worker == "ESClassifier":
        return ESClassifier(
            audio=build_audio_head(m.audio, **kw),
            text=build_text_head(m.text, **kw) if "text" in m else None,
            loss=build_loss_head(m.loss, **loss_kwargs),
        )
    if worker == "CLVP":
        return CLVP(
            image=build_image_head(m.image, **kw),
            text=build_text_head(m.text, **kw),
            loss=build_loss_head(m.loss, **loss_kwargs),
        )
    # custom registrations: the class must know how to build itself from
    # the config (returning the bare class would crash later in init_model)
    cls = MODELS.get(worker)
    if hasattr(cls, "from_config"):
        return cls.from_config(cfg, output_dim=output_dim)
    raise ValueError(
        f"worker {worker!r} is registered but has no from_config(cfg, "
        "output_dim=...) classmethod; built-in workers: CVAP, CLAP, CVALP, "
        "CVASP, ASClassifier, ESClassifier, CLVP"
    )


# ---------------------------------------------------------------------------
# example batches (init + graft entry)
# ---------------------------------------------------------------------------


def example_batch(cfg, batch_size: int = 2, output_dim: Optional[int] = None) -> Tuple:
    """A zero batch with the shapes the worker's __call__ expects."""
    m = cfg.model
    run = cfg.running
    res = m.image.get("resolution", 224) if "image" in m else 224
    image = np.zeros((batch_size, 3, int(res), int(res)), np.float32)
    audio = np.zeros(
        (batch_size, 1, int(run.max_audio_len), int(run.num_mel_bins)), np.float32
    )
    ctx = int(m.text.get("ctx_len", 77)) if "text" in m else 77
    text = np.zeros((batch_size, ctx), np.int32)
    text[:, 0], text[:, 1] = 49406, 49407

    worker = cfg.worker
    if worker == "CVAP":
        return (image, audio)
    if worker == "CLAP":
        return (audio, text)
    if worker == "CVALP":
        return (image, audio, text)
    if worker == "CVASP":
        return (image, image, audio, image, audio)
    if worker == "ASClassifier":
        nlabel = int(output_dim or cfg.get("output_dim", 10))
        labels = np.zeros((batch_size, nlabel), np.float32)
        return (image, audio, labels)
    if worker == "ESClassifier":
        labels = np.zeros((batch_size,), np.int32)
        return (audio, labels)
    if worker == "CLVP":
        return (image, text)
    raise KeyError(worker)


def _deep_merge(dst: Dict, src: Dict) -> Dict:
    out = dict(dst)
    for k, v in src.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        elif k not in out:
            out[k] = v
    return out


def init_model(cfg, module, seed: int = 0, batch=None, output_dim=None):
    """Initialize ALL tower params, including ones the training ``__call__``
    doesn't touch (e.g. the classifier's zero-shot text tower, the CLAP
    captioning decoder)."""
    batch = batch if batch is not None else example_batch(cfg, output_dim=output_dim)
    batch = tuple(jnp.asarray(b) for b in batch)
    key = jax.random.PRNGKey(seed)
    variables = dict(module.init(key, *batch))

    worker = cfg.worker
    extras = []
    ctx = int(cfg.model.text.get("ctx_len", 77)) if "text" in cfg.model else 77
    text_ids = jnp.zeros((1, ctx), jnp.int32).at[0, 0].set(49406).at[0, 1].set(49407)
    if worker in ("ESClassifier", "ASClassifier") and getattr(module, "text", None) is not None:
        extras.append(((text_ids,), {"method": "encode_text"}))
    if worker == "CLAP" and getattr(module, "decoder", None) is not None:
        audio = jnp.asarray(batch[0])
        extras.append(((audio, text_ids.repeat(audio.shape[0], 0)), {"method": "forward_caption"}))
    for args, kw in extras:
        extra_vars = module.init(key, *args, **kw)
        variables["params"] = _deep_merge(variables["params"], extra_vars["params"])
    return variables


# ---------------------------------------------------------------------------
# freezing
# ---------------------------------------------------------------------------

_STAGE_ALIASES = {
    "pre_encoder": "pre",
    "post_encoder": "post",
    "encoder": "encoder",
    "misc": "misc",
    "pre_encoder_addon": "pre_addon",
    "post_encoder_addon": "post_addon",
}


def tunable_mask(cfg, params: Dict, ties: Sequence[Tuple[str, str]] = ()) -> Dict:
    """Bool pytree: True = trainable.

    Parity with the reference's tunable-dict logic
    (`/root/reference/cvap/monitor/cvap.py:292-296`): per-tower ``freeze``
    config flags, per-stage ``excl_modules`` lists
    (`/root/reference/cvap/model/audioset_clf.py:164-170`), loss heads always
    tunable, and tie-source params tunable when any tying tower is tunable
    (`/root/reference/cvap/model/cvalp.py:190-200`).
    """
    m = cfg.model
    tower_frozen = {}
    for field, key in (("image", "image"), ("image_v", "image"), ("audio", "audio"), ("text", "text")):
        if key in m and "freeze" in m[key]:
            tower_frozen[field] = bool(m[key].freeze)

    excl: Dict[str, List[str]] = {}
    run = cfg.get("running", None)
    if run is not None and "excl_modules" in run:
        em = run.excl_modules
        for mod_key, tower in (("vmodules", "image"), ("amodules", "audio"), ("lmodules", "text")):
            names = em.get(mod_key, []) or []
            excl[tower] = [_STAGE_ALIASES.get(n, n) for n in names]

    def mark(tree, value):
        return jax.tree_util.tree_map(lambda _: value, tree)

    mask: Dict[str, Any] = {}
    for tower_name, sub in params.items():
        frozen = tower_frozen.get(tower_name, False)
        sub_mask = mark(sub, not frozen)
        for stage in excl.get(tower_name, []):
            if isinstance(sub_mask, dict) and stage in sub_mask:
                sub_mask[stage] = mark(sub_mask[stage], False)
        mask[tower_name] = sub_mask

    # tie sources: trainable if the source tower OR any destination tower is
    for dst, src in ties:
        dst_tower, src_tower = dst.split("/")[0], src.split("/")[0]
        if not tower_frozen.get(dst_tower, False) or not tower_frozen.get(src_tower, False):
            node = mask
            parts = src.split("/")
            for part in parts[:-1]:
                node = node[part]
            node[parts[-1]] = mark(node[parts[-1]], True)
    return mask


def siamese_ties(cfg) -> List[Tuple[str, str]]:
    """running.siamese.{amodules,lmodules} → tie path pairs: the audio/text
    tower's listed stages share the image tower's parameters
    (parity: `/root/reference/cvap/model/cvalp.py:147-180`).

    CVASP additionally ties the whole view image tower to the pivot tower —
    the reference encodes pivot and augmented views with one image head
    (`/root/reference/cvap/model/siamese_va.py:33-66`)."""
    ties: List[Tuple[str, str]] = []
    if cfg.get("worker") == "CVASP":
        ties.append(("image_v", "image"))
    run = cfg.get("running", None)
    if run is None or "siamese" not in run or not bool(run.siamese.get("alive", False)):
        return ties
    for key, tower in (("amodules", "audio"), ("lmodules", "text")):
        for name in run.siamese.get(key, []) or []:
            stage = _STAGE_ALIASES.get(name, name)
            ties.append((f"{tower}/{stage}", f"image/{stage}"))
    return ties


# ---------------------------------------------------------------------------
# CLIP-weight initialization
# ---------------------------------------------------------------------------


def port_model_from_clip(cfg, module, variables, clip_sd) -> Dict:
    """Initialize the composed model's towers from a CLIP state dict:
    image/text verbatim, audio from the visual tower with grid retarget,
    loss-head logit_scale copied (parity:
    `/root/reference/cvap/model/cvap.py:100-128` init priority and
    `/root/reference/cvap/model/clap.py:80-157`)."""
    visual_sd, text_sd = split_clip_state_dict(clip_sd)
    params = dict(variables["params"])
    extra: Dict[str, Dict] = {}

    for field in ("image", "image_v"):
        if field in params and hasattr(module, field) and getattr(module, field) is not None:
            tower = getattr(module, field)
            if hasattr(tower, "backbone"):
                ported = port_clip_visual(visual_sd, tower)
                params[field] = ported["params"]
                if "batch_stats" in ported:
                    extra.setdefault("batch_stats", dict(variables.get("batch_stats", {})))[
                        field
                    ] = ported["batch_stats"]
    if "audio" in params and getattr(module, "audio", None) is not None:
        tower = module.audio
        if hasattr(tower, "backbone"):
            ported = port_clip_visual(visual_sd, tower, use_slice=False)
            params["audio"] = ported["params"]
            if "batch_stats" in ported:
                extra.setdefault("batch_stats", dict(variables.get("batch_stats", {})))[
                    "audio"
                ] = ported["batch_stats"]
    if "text" in params and getattr(module, "text", None) is not None:
        tower = module.text
        if hasattr(tower, "ctx_len"):
            params["text"] = port_clip_text(text_sd, tower)["params"]

    if "logit_scale" in clip_sd:
        scale = np.asarray(
            clip_sd["logit_scale"].detach().cpu().numpy()
            if hasattr(clip_sd["logit_scale"], "detach")
            else clip_sd["logit_scale"]
        )
        params = _copy_logit_scales(params, scale)

    # pipeline-stacked trunks store blocks [L, ...]; porters emit the
    # unrolled block_{i} layout — re-lay to match the model
    from ..parallel.pipeline import adapt_trunk_layout

    params = adapt_trunk_layout(params, variables["params"])
    out = {**variables, "params": params}
    out.update(extra)
    return out


def _copy_logit_scales(tree, scale):
    if isinstance(tree, dict):
        return {
            k: (jnp.asarray(scale, jnp.float32) if k == "logit_scale" else _copy_logit_scales(v, scale))
            for k, v in tree.items()
        }
    return tree
