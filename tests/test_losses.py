import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.nn.losses import (
    BarlowLossHead,
    BCELossHead,
    BCHingeLossHead,
    CELossHead,
    ClassificationHead,
    ImagineAndClassifyLossHead,
    LMLossHead,
    VACELossHead,
    VALCELossHead,
)


def _emb(rng, n, d=8):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x)


def test_ce_loss_perfect_vs_random(rng):
    x = _emb(rng, 16)
    head = CELossHead()
    params = head.init(jax.random.PRNGKey(0), x, x)
    loss_same = head.apply(params, x, x)
    y = _emb(rng, 16)
    loss_diff = head.apply(params, x, y)
    assert float(loss_same) < float(loss_diff)
    # gradient flows to logit_scale
    g = jax.grad(lambda p: head.apply(p, x, y))(params)
    assert abs(float(g["params"]["logit_scale"])) > 0


def test_ce_loss_scale_clamp(rng):
    x = _emb(rng, 4)
    head = CELossHead(scale_max=1.0)
    params = head.init(jax.random.PRNGKey(0), x, x)
    # logit_scale init exp = 1/0.07 ≈ 14.28 → clamped to 1
    params2 = {"params": {"logit_scale": jnp.asarray(10.0)}}
    l1 = head.apply(params2, x, x)
    params3 = {"params": {"logit_scale": jnp.asarray(0.0)}}
    l3 = head.apply(params3, x, x)
    assert float(l1) == pytest.approx(float(l3), rel=1e-5)


def test_classification_head(rng):
    x = _emb(rng, 8, 16)
    labels = jnp.asarray(np.arange(8) % 4)
    head = ClassificationHead(num_labels=4)
    params = head.init(jax.random.PRNGKey(0), x, labels)
    loss = head.apply(params, x, labels)
    assert np.isfinite(float(loss))
    logits = head.apply(params, x, train=False)
    assert logits.shape == (8, 4)


def test_bce_loss_and_eval(rng):
    x = _emb(rng, 8, 16)
    labels = jnp.asarray((rng.random((8, 5)) > 0.5).astype(np.float32))
    head = BCELossHead(num_labels=5)
    params = head.init(jax.random.PRNGKey(0), x, labels)
    loss = head.apply(params, x, labels)
    assert np.isfinite(float(loss))
    probs = head.apply(params, x, labels, train=False)
    assert probs.shape == (8, 5)
    assert (np.asarray(probs) >= 0).all() and (np.asarray(probs) <= 1).all()


def test_bchinge_matches_torch(rng):
    torch = pytest.importorskip("torch")
    scores = rng.random((4, 6)).astype(np.float32)
    labels = (rng.random((4, 6)) > 0.6).astype(np.float32)
    labels[0] = 0  # a row with no positives
    # torch MultiLabelMarginLoss with converted index labels
    seqs = []
    for i in range(4):
        lid = np.where(labels[i] > 0)[0]
        pad = np.full(6 - len(lid), -1)
        seqs.append(np.concatenate([lid, pad]))
    t_loss = torch.nn.MultiLabelMarginLoss()(
        torch.tensor(scores), torch.tensor(np.stack(seqs), dtype=torch.long)
    ).item()
    # our pairwise-hinge formulation on the binary matrix
    pos = labels.astype(bool)
    diff = scores[:, :, None] - scores[:, None, :]
    hinge = np.maximum(0.0, 1.0 - diff)
    mask = pos[:, :, None] & (~pos[:, None, :])
    ours = (hinge * mask).sum((1, 2)) / 6.0
    assert ours.mean() == pytest.approx(t_loss, rel=1e-5)


def test_barlow_loss(rng):
    x = _emb(rng, 16, 8)
    head = BarlowLossHead(embed_dim=8, layers=(16, 16))
    variables = head.init(jax.random.PRNGKey(0), x, x)
    loss, _ = head.apply(variables, x, x, mutable=["batch_stats"])
    assert np.isfinite(float(loss))
    y = _emb(rng, 16, 8)
    loss2, _ = head.apply(variables, x, y, mutable=["batch_stats"])
    assert float(loss) < float(loss2)  # identical views → smaller loss


def test_valce_and_vace(rng):
    v, a, l = _emb(rng, 8), _emb(rng, 8), _emb(rng, 8)
    head = VALCELossHead(va=True, lv=False, al=True)
    params = head.init(jax.random.PRNGKey(0), v, a, l)
    total, aux = head.apply(params, v, a, l)
    assert set(aux) == {"va", "al"}
    assert float(total) == pytest.approx(float(aux["va"] + aux["al"]), rel=1e-6)

    head2 = VACELossHead(vp=True, ap=False, va=True, vv=True, aa=False)
    params2 = head2.init(jax.random.PRNGKey(0), v, v, a, v, a)
    total2, aux2 = head2.apply(params2, v, v, a, v, a)
    assert set(aux2) == {"vp", "va", "vv"}


def test_imagine_and_classify(rng):
    audio, image = _emb(rng, 8, 16), _emb(rng, 8, 16)
    labels = jnp.asarray((rng.random((8, 5)) > 0.5).astype(np.float32))
    head = ImagineAndClassifyLossHead(num_labels=5, embed_dim=16, a2v_layers=(16,))
    params = head.init(jax.random.PRNGKey(0), audio, labels, image)
    total, aux = head.apply(params, audio, labels, image)
    assert {"ce", "bce"} == set(aux)
    assert np.isfinite(float(total))


def test_lm_loss_ignores_pad(rng):
    logits = jnp.asarray(rng.standard_normal((2, 5, 10)).astype(np.float32))
    tgt = np.array([[1, 2, 3, 0, 0], [4, 5, 0, 0, 0]], dtype=np.int32)
    head = LMLossHead()
    params = head.init(jax.random.PRNGKey(0), logits, jnp.asarray(tgt))
    loss = head.apply(params, logits, jnp.asarray(tgt))
    # changing logits at padded positions must not change the loss
    logits2 = logits.at[:, 3:, :].add(100.0)
    loss2 = head.apply(params, logits2, jnp.asarray(tgt))
    assert float(loss) == pytest.approx(float(loss2), rel=1e-6)


def test_lm_loss_learnable_temperature(rng):
    """The LM head scales decoder logits by a learnable exp(logit_scale)
    (init log 1/0.07) before CE, like the reference's LM head
    (`/root/reference/cvap/module/decoder/loss_more.py:280,375-376`) whose
    released checkpoints carry the parameter."""
    logits = jnp.asarray(rng.standard_normal((2, 5, 10)).astype(np.float32))
    tgt = jnp.asarray(np.array([[1, 2, 3, 0, 0], [4, 5, 6, 0, 0]], np.int32))
    head = LMLossHead(scaling=True)
    params = head.init(jax.random.PRNGKey(0), logits, tgt)
    assert "logit_scale" in params["params"]
    s = float(params["params"]["logit_scale"])
    assert s == pytest.approx(np.log(1 / 0.07), rel=1e-6)
    loss = float(head.apply(params, logits, tgt))
    # equals plain masked CE computed on exp(s)-scaled logits
    scaled = np.exp(s) * np.asarray(logits)
    logp = scaled - np.log(np.exp(scaled).sum(-1, keepdims=True))
    t = np.asarray(tgt)
    nll = -np.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    mask = (t != 0).astype(np.float32)
    want = (nll * mask).sum() / mask.sum()
    assert loss == pytest.approx(float(want), rel=1e-5)
    # scaling=False: no param, unscaled CE (the reference's log(1/1) buffer)
    head0 = LMLossHead(scaling=False)
    p0 = head0.init(jax.random.PRNGKey(0), logits, tgt)
    assert "logit_scale" not in p0.get("params", {})
    l0 = float(head0.apply(p0, logits, tgt))
    logp0 = np.asarray(logits) - np.log(
        np.exp(np.asarray(logits)).sum(-1, keepdims=True)
    )
    nll0 = -np.take_along_axis(logp0, t[..., None], axis=-1)[..., 0]
    want0 = (nll0 * mask).sum() / mask.sum()
    assert l0 == pytest.approx(float(want0), rel=1e-5)


def test_imagine_ce_only_eval_fails_loud(rng):
    """ce-only imagine configs evaluate through the retrieval/zero-shot
    paths; asking this head for multilabel eval scores must raise the
    documented error, not a bare AssertionError."""
    audio = _emb(rng, 4, 16)
    labels = jnp.asarray((rng.random((4, 5)) > 0.5).astype(np.float32))
    head = ImagineAndClassifyLossHead(
        num_labels=5, embed_dim=16, use_bce=False, a2v_layers=(16,)
    )
    params = head.init(jax.random.PRNGKey(0), audio, labels, _emb(rng, 4, 16))
    with pytest.raises(ValueError, match="bce.alive"):
        head.apply(params, audio, labels, train=False)
