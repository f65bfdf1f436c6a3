import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.models import (
    build_main_model,
    example_batch,
    init_model,
    siamese_ties,
    tunable_mask,
)

SMALL = [
    "+running=bimodal",
    "+model/image=vit_val",
    "+model/audio=vit_val",
    "+model/text=transformer_val",
    "+model/loss=ce",
    "+optimizer=standard",
    "+running/audio=default",
    "model.image.width=64",
    "model.image.embed_dim=32",
    "model.image.encoder.layers=2",
    "model.image.heads=4",
    "model.text.width=32",
    "model.text.heads=4",
    "model.text.encoder.layers=2",
    "running.audio.max_len=100",
    "model.audio.pre_encoder.stride=[16,24]",
]


def make(worker, extra=()):
    cfg = compose(SMALL + [f"worker={worker}"] + list(extra))
    return cfg


def test_cvap_forward_loss():
    cfg = make("CVAP")
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    batch = tuple(jnp.asarray(b) for b in example_batch(cfg))
    loss = model.apply(variables, *batch)
    assert np.isfinite(float(loss))


def test_cvap_precomputed_passthrough():
    cfg = make("CVAP")
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    emb = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32)), jnp.float32)
    audio = jnp.asarray(example_batch(cfg)[1])
    loss = model.apply(variables, emb, audio)
    assert np.isfinite(float(loss))


def test_clap_retrieval():
    cfg = make("CLAP")
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    audio, text = (jnp.asarray(b) for b in example_batch(cfg))
    loss = model.apply(variables, audio, text, retrieval=True)
    assert np.isfinite(float(loss))
    a, t = model.apply(variables, audio, text, method="features")
    assert a.shape == (2, 32) and t.shape == (2, 32)


def test_cvalp_trimodal():
    cfg = make("CVALP", ["+model/loss=ce_val"])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    batch = tuple(jnp.asarray(b) for b in example_batch(cfg))
    total, aux = model.apply(variables, *batch)
    assert {"va", "al"} <= set(aux)


def test_esc_classifier():
    cfg = make("ESClassifier", ["+model/loss=ce_cls"])
    model = build_main_model(cfg, output_dim=50)
    variables = init_model(cfg, model)
    audio, labels = (jnp.asarray(b) for b in example_batch(cfg))
    loss = model.apply(variables, audio, labels)
    assert np.isfinite(float(loss))
    preds = model.apply(variables, audio, method="predictions")
    assert preds.shape == (2,)


def test_audioset_classifier_imagine():
    cfg = make("ASClassifier", ["+model/loss=imagine_and_classify"])
    cfg.set_path("output_dim", 10)
    model = build_main_model(cfg, output_dim=10)
    variables = init_model(cfg, model)
    image, audio, labels = (jnp.asarray(b) for b in example_batch(cfg))
    total, aux = model.apply(variables, image, audio, labels)
    assert {"ce", "bce"} == set(aux)


def test_tunable_mask_freeze_semantics():
    cfg = make("CVAP")  # image frozen, audio trainable by default configs
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    leaves_img = jax.tree_util.tree_leaves(mask["image"])
    leaves_aud = jax.tree_util.tree_leaves(mask["audio"])
    assert not any(leaves_img)
    assert all(leaves_aud)
    assert all(jax.tree_util.tree_leaves(mask["loss"]))


def test_siamese_ties_from_config():
    cfg = make(
        "CVALP",
        [
            "+model/loss=ce_val",
            "running.siamese.alive=True",
            "running.siamese.amodules=[encoder,misc]",
            "running.siamese.lmodules=[]",
        ],
    )
    ties = siamese_ties(cfg)
    assert ("audio/encoder", "image/encoder") in ties
    assert ("audio/misc", "image/misc") in ties
    # tie sources become tunable because the audio tower is tunable
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"], ties)
    assert all(jax.tree_util.tree_leaves(mask["image"]["encoder"]))
    assert not any(jax.tree_util.tree_leaves(mask["image"]["pre"]))


def test_cvasp_view_tower_tied():
    from vipant_tpu.models import siamese_ties

    cfg = make("CVASP", ["+model/loss=ce_va"])
    ties = siamese_ties(cfg)
    assert ("image_v", "image") in ties
