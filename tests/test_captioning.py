"""CLAP captioning branch: SeqGenerationHead training + greedy decode."""

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.train import build_monitor
from data_synth import make_synth_clotho

from test_trainers import TINY_MODEL


def caption_cfg(tmp_path):
    return compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/text=transformer_decoder",
        "+model/loss=ce_lm",
        "worker=CLAP",
        "monitor=LAMonitor",
        # decoder geometry for the tiny model
        "model.text.width=32",
        "model.text.heads=4",
        "model.text.layers=2",
        "model.text.mem_width=64",
        "model.text.max_len_dec=8",
        "model.text.embed_dim=32",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=clotho_dev",
        "running.test_name=",
        "running.retrieval=False",
        "running.batch_size=2",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=4",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])


class _CaptionTrainerAdapter:
    pass


def test_clap_captioning_train_and_decode(tmp_path):
    make_synth_clotho(str(tmp_path), "clotho_dev", n=4, seconds=1.05)
    cfg = caption_cfg(tmp_path)
    mon = build_monitor(cfg)

    # override the loss adapter for the captioning branch
    import jax

    from vipant_tpu.train import make_train_step

    def adapter(model, variables, batch, rngs):
        return model.apply(variables, *batch, retrieval=False, train=True, rngs=rngs)

    mon.train_step = make_train_step(mon.model, mon.tx, loss_adapter=adapter, donate=True)
    mon.epoch(0)  # one epoch of LM training must run

    captions = mon.decode_captions(mon.evalloader, max_batches=1)
    assert len(captions) >= 1
    assert all(isinstance(c, str) for c in captions)


def test_decode_routes_device_frontend(tmp_path):
    """Caption decoding under waveform shipping (running.audio.on_device):
    eval batches carry raw rank-2 waveforms that decode_captions must route
    through the device frontend — fed straight to decode() they hit the
    precomputed-embedding passthrough (regression: ValueError unpack or
    silent garbage memory)."""
    make_synth_clotho(str(tmp_path), "clotho_dev", n=4, seconds=1.05)
    cfg = compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/text=transformer_decoder",
        "+model/loss=ce_lm",
        "worker=CLAP",
        "monitor=LAMonitor",
        "model.text.width=32",
        "model.text.heads=4",
        "model.text.layers=2",
        "model.text.mem_width=64",
        "model.text.max_len_dec=8",
        "model.text.embed_dim=32",
        "running.audio.on_device=True",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=clotho_dev",
        "running.test_name=",
        "running.retrieval=False",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=4",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    assert mon.on_device_audio
    captions = mon.decode_captions(mon.evalloader, max_batches=2)
    assert len(captions) == 4
    assert all(isinstance(c, str) for c in captions)
    report = mon.caption_report(mon.evalloader, samples=4)
    assert "BLEU-1" in report


def test_kv_cache_decode_matches_full_reforward(tmp_path):
    """greedy_decode_kv must produce the same ids as the O(L^2) re-forward
    decode."""
    import jax
    import jax.numpy as jnp

    from vipant_tpu.nn.seqgen import SeqGenerationHead

    head = SeqGenerationHead(
        width=32, layers=2, heads=4, ctx_len=16, vocab_size=100,
        embed_dim=32, mem_width=24, max_len_dec=7,
    )
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((2, 3, 2, 24)), jnp.float32)
    ids_init = jnp.asarray(rng.integers(0, 100, (2, 16)), jnp.int32)
    variables = head.init(jax.random.PRNGKey(0), ids_init, feat)

    ids_a, logits_a = head.apply(variables, feat, method="greedy_decode")
    ids_b, logits_b = head.apply(variables, feat, method="greedy_decode_kv")
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), rtol=2e-4, atol=2e-4
    )


def test_beam_decode(tmp_path):
    """beam_decode_kv: beam=1 must reduce to greedy; wider beams return a
    hypothesis with log-prob >= the greedy sequence's (beam search can only
    find better-or-equal scoring sequences under the same model)."""
    import jax
    import jax.numpy as jnp

    from vipant_tpu.nn.seqgen import SeqGenerationHead

    V, L = 100, 7
    head = SeqGenerationHead(
        width=32, layers=2, heads=4, ctx_len=16, vocab_size=V,
        embed_dim=32, mem_width=24, max_len_dec=L,
    )
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.standard_normal((3, 3, 2, 24)), jnp.float32)
    ids_init = jnp.asarray(rng.integers(0, V, (3, 16)), jnp.int32)
    variables = head.init(jax.random.PRNGKey(0), ids_init, feat)
    sot, eot = 1, 2

    g_ids, g_logits = head.apply(
        variables, feat, sot_token=sot, method="greedy_decode_kv"
    )
    b1_ids, _ = head.apply(
        variables, feat, beam=1, sot_token=sot, eot_token=eot,
        method="beam_decode_kv",
    )
    np.testing.assert_array_equal(np.asarray(g_ids), np.asarray(b1_ids))

    b4_ids, b4_scores = head.apply(
        variables, feat, beam=4, sot_token=sot, eot_token=eot,
        method="beam_decode_kv",
    )
    assert b4_ids.shape == g_ids.shape

    def seq_logprob(ids, logits):
        lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
        out = np.zeros(ids.shape[0])
        for b in range(ids.shape[0]):
            for t in range(L):
                tok = int(ids[b, t + 1])
                out[b] += float(lp[b, t, tok])
                if tok == eot:
                    break
        return out

    greedy_lp = seq_logprob(np.asarray(g_ids), np.asarray(g_logits))
    # score the beam sequence by re-forwarding it through the train path
    pad = jnp.zeros((b4_ids.shape[0], 16 - (L + 1)), jnp.int32)
    full = jnp.concatenate([jnp.asarray(b4_ids), pad], axis=1)
    _, relogits = head.apply(variables, full, feat)
    beam_lp = seq_logprob(np.asarray(b4_ids), np.asarray(relogits)[:, : L])
    assert np.all(beam_lp >= greedy_lp - 1e-3), (beam_lp, greedy_lp)


@pytest.mark.slow  # compile-heavy; covered by faster siblings in the fast tier
def test_caption_report_bleu(tmp_path):
    """End-to-end captioning eval asserts a BLEU metric value."""
    make_synth_clotho(str(tmp_path), "clotho_dev", n=4, seconds=1.05)
    cfg = caption_cfg(tmp_path)
    mon = build_monitor(cfg)
    report = mon.infer(mon.evalloader)
    assert "BLEU-4 =" in report and "BLEU-1 =" in report
    import re

    b1 = float(re.search(r"BLEU-1 = ([\d.]+)", report).group(1))
    assert 0.0 <= b1 <= 100.0


def test_corpus_bleu_known_values():
    from vipant_tpu.eval.metrics import corpus_bleu

    # perfect match -> 100 across orders
    b = corpus_bleu(["the cat sat on the mat"], [["the cat sat on the mat"]])
    assert all(abs(v - 100.0) < 1e-6 for v in b.values())
    # half the unigrams match, no higher-order matches
    b = corpus_bleu(["the cat"], [["the dog"]])
    assert abs(b["BLEU-1"] - 50.0) < 1e-6 and b["BLEU-2"] == 0.0
    # brevity penalty: candidate shorter than reference
    b = corpus_bleu(["the cat"], [["the cat sat down"]])
    assert abs(b["BLEU-1"] - 100.0 * np.exp(1 - 4 / 2)) < 1e-4


def test_rouge_l_known_values():
    from vipant_tpu.eval.metrics import rouge_l

    # perfect match -> 100
    assert abs(rouge_l(["a b c d"], [["a b c d"]]) - 100.0) < 1e-6
    # no overlap -> 0
    assert rouge_l(["a b"], [["c d"]]) == 0.0
    # LCS "a c" of cand "a b c" (len 3) vs ref "a c d" (len 3):
    # P = R = 2/3 -> F = 2/3 regardless of beta
    assert abs(rouge_l(["a b c"], [["a c d"]]) - 100.0 * 2 / 3) < 1e-4
    # max over references: second ref matches exactly
    assert abs(rouge_l(["a b"], [["c d", "a b"]]) - 100.0) < 1e-6


def test_cider_d_properties():
    from vipant_tpu.eval.metrics import cider_d

    cands = ["a dog barks loudly", "rain falls on the roof", "a car engine revs"]
    refs = [
        ["a dog barks loudly", "a loud dog barking"],
        ["rain falls on the roof", "rain hitting a rooftop"],
        ["a car engine revs", "an engine revving"],
    ]
    perfect = cider_d(cands, refs)
    assert perfect > 0.0
    # corrupting one candidate strictly lowers the consensus score
    worse = cider_d(["birds sing"] + cands[1:], refs)
    assert worse < perfect
    # disjoint vocabulary -> zero
    assert cider_d(["x y z", "p q r"], [["p q r"], ["x y z"]]) == 0.0
    # length penalty: same n-grams but padded candidate scores lower
    # (multi-doc corpus so idf > 0)
    base = cider_d(["a dog barks"] + cands[1:], [["a dog barks"]] + refs[1:])
    padded = cider_d(
        ["a dog barks a dog barks a dog barks"] + cands[1:],
        [["a dog barks"]] + refs[1:],
    )
    assert padded < base
