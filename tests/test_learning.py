"""Learning-verification tier: prove the composed system LEARNS.

The reference's implicit contract is that its training loop makes the loss
go down (`/root/reference/cvap/monitor/cvap.py:160-244`) — every released
checkpoint is evidence that it did. Mechanics/shape/equality tests cannot
falsify a loss-sign error, a wrong LR scale, an inverted freeze mask, or a
label/feature misalignment. These tests can: each one overfits a tiny model
on a small FIXED synthetic dataset through the real monitor stack
(loader -> make_batch -> train_step -> eval) and asserts

  (a) substantial loss descent (read from the metrics.jsonl telemetry), and
  (b) near-perfect / above-chance train-split eval metrics.

Synthetic data is genuinely learnable: audio clips are pure tones at
distinct frequencies (a distinct mel bin lights up per item) and images are
per-item fixed noise (the frozen image tower maps each to a distinct
anchor), so contrastive memorization must succeed if and only if the
composition is correct.
"""

import json
import os
import re

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.train import build_monitor
from data_synth import (
    make_synth_audioset,
    make_synth_audioset_captions,
    make_synth_clotho,
    make_synth_esc50,
    make_synth_va_index,
    make_synth_va_npz_index,
)

# Tiny-but-trainable model; fbank SpecAugment off so the inputs are fixed
# across epochs (pure memorization).
TINY = [
    "+model/image=vit_val",
    "+model/audio=vit_val",
    "+model/text=transformer_val",
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
    "running.audio.transform_fbank=False",
    "model.audio.pre_encoder.stride=[16,24]",
    "optimizer.use_lars=False",
    "optimizer.warmup=False",
    "optimizer.lr=2.0e-3",
    "verbose=False",
    "num_proc=2",
    "mesh.data=2",
    "metrics_jsonl=True",
    "running.peep_rate=1",
    "running.save_rate=1000000",
    "running.save_epoch=False",
]


def _losses(mon):
    path = os.path.join(mon.out_dir, "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line)["loss"] for line in f if line.strip()]


def _run(overrides):
    cfg = compose(overrides)
    mon = build_monitor(cfg)
    mon.learn()
    return mon, _losses(mon)


@pytest.mark.slow
def test_cvap_overfit_loss_and_retrieval(tmp_path):
    """VA contrastive memorization: loss ~4.2 (= 2*log 8, symmetric CE at
    chance) -> <0.3, and train-split R@1 -> ~100. Uses the precomputed-fbank
    npz variant so the ~450 steps are not dominated by per-epoch wav
    decode+fbank (that path is exercised by the other tests here)."""
    n = 16
    make_synth_va_npz_index(str(tmp_path / "data"), "npz_train", n=n)
    mon, losses = _run([
        "+running=bimodal",
        *[o for o in TINY if not o.startswith("optimizer.lr")],
        "optimizer.lr=4.0e-3",
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/data",
        "running.data_name=npz_train",
        "running.eval_name=npz_train",  # memorization probe: eval ON train
        "running.batch_size=8",
        "running.epochs=320",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    initial = np.mean(losses[:2])
    final = np.mean(losses[-6:])
    assert initial > 3.0, f"initial loss suspiciously low: {initial}"
    assert final < 0.15 * initial, f"no descent: {initial} -> {final}"
    assert final < 0.7, f"did not memorize: final loss {final}"

    from vipant_tpu.eval import symmetric_retrieval

    data = mon.collect_features(mon.evalloader)
    sym = symmetric_retrieval(data["x1"], data["x2"])
    # thresholds leave room for ~2 misses of 16 (small run-to-run variance
    # from loader thread timing); chance is 1/16 = 6.2%
    assert sym["12"]["t1"] >= 85.0, f"I->A R@1 {sym['12']['t1']} (chance {100 / n:.1f})"
    assert sym["21"]["t1"] >= 85.0, f"A->I R@1 {sym['21']['t1']}"


@pytest.mark.slow
def test_cvap_lars_path_descends(tmp_path):
    """The LARS + cosine-adjust composition must also descend — a wrong
    trust-ratio/lr-scale sign or scaling (optim/lars.py) would stall or
    explode here while all parity tests stay green. The reference's
    production knobs (lr_weight 0.2 scaled by batch/256, eta 1e-3) move the
    weights by ~6e-6*||w|| per step at this batch size — invisible in a
    160-step test (measured: flat at chance) — so the test boosts
    lr_weight/eta; a sign or composition error still shows as flat/diverged."""
    make_synth_va_npz_index(str(tmp_path / "data"), "npz_train", n=16)
    overrides = [
        "+running=bimodal",
        *[o for o in TINY if not o.startswith("optimizer.")],
        "optimizer.use_lars=True",
        "optimizer.warmup=False",
        "optimizer.lr_weight=10",
        "optimizer.lr_bias=0.24",
        "optimizer.eta=0.01",
        "+model/loss=ce",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/data",
        "running.data_name=npz_train",
        "running.eval_name=",
        "running.batch_size=8",
        "running.epochs=80",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ]
    _, losses = _run(overrides)
    initial, final = np.mean(losses[:2]), np.mean(losses[-8:])
    assert np.isfinite(final), f"LARS diverged: {losses[-5:]}"
    assert final < 0.6 * initial, f"LARS did not descend: {initial} -> {final}"


@pytest.mark.slow
def test_clap_overfit_retrieval(tmp_path):
    """AT fine-tuning memorization: audio<->caption R@1 -> high."""
    make_synth_clotho(str(tmp_path), "clotho_dev", n=8, seconds=1.05)
    # lr 2e-3: 4e-3 was measured to descend and then COLLAPSE back to chance
    # around step ~600 on this task — the test pins the stable recipe
    mon, losses = _run([
        "+running=clotho",
        *TINY,
        "+model/loss=ce",
        "worker=CLAP",
        "monitor=LAMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=clotho_dev",
        "running.test_name=",
        "running.batch_size=4",
        "running.epochs=400",
        "running.eval_loss_bound=inf",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    initial, final = np.mean(losses[:2]), np.mean(losses[-6:])
    assert final < 0.5 * initial, f"no descent: {initial} -> {final}"
    report = mon.infer(mon.evalloader)
    # 1-vs-5 best-of-k retrieval: chance is 1/8 = 12.5%
    a2t = float(re.search(r"A->T: t1 = *([\d.]+)", report).group(1))
    assert a2t >= 75.0, f"A->T t1 {a2t} ({report})"


@pytest.mark.slow
def test_asclassifier_learns_ranking(tmp_path):
    """AudioSet multi-label BCE: train-split mAP/mAUC climb well above the
    ~50% chance level (falsifies label/feature misalignment in the clf
    path). Notes from tuning this test: a random-init ViT collapses all
    items to pairwise cosine ~0.996, so the LN+Linear BCE head's logits
    grow only slowly — BCE hovers near ln2 while the RANKING (mAP) learns;
    measured mAP 49 -> ~85 over 800 steps. That matches the reference's
    usage (it only ever fine-tunes pretrained towers on this task,
    `/root/reference/README.md:38-43`), so the assertions here are on
    ranking metrics, not on loss magnitude. scaling=False is the
    reference's own non-scaling branch
    (`/root/reference/cvap/module/decoder/loss_more.py:48-51`) — with the
    default learnable logit_scale (x14.3 at init) the sigmoids saturate and
    even the ranking cannot move."""
    make_synth_audioset(str(tmp_path), "as_train", n=16, seconds=1.05)
    mon, losses = _run([
        "+running=audioset",
        *[o for o in TINY if not o.startswith("optimizer.lr")],
        "optimizer.lr=3.0e-3",
        "+model/loss=bce",
        "model.loss.scaling=False",
        "worker=ASClassifier",
        "monitor=ASMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=as_train",
        "running.eval_name=as_train",
        "running.test_name=",
        "running.clf=True",
        "running.batch_size=8",
        "running.epochs=400",
        "running.mixup_rate=0.0",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    assert np.isfinite(losses[-1]) and np.mean(losses[-6:]) <= np.mean(losses[:2]) + 0.05
    report = mon.infer(mon.evalloader)
    m = float(re.search(r"mAP = *([\d.]+)", report).group(1))
    auc = float(re.search(r"mAUC = *([\d.]+)", report).group(1))
    assert m >= 75.0, f"train-split mAP {m} barely above chance ({report})"
    assert auc >= 75.0, f"train-split mAUC {auc} barely above chance ({report})"


@pytest.mark.slow
def test_cvalp_trimodal_overfit(tmp_path):
    """Trimodal memorization through the SIAMESE shared-module build
    (VERDICT r4 #1a): synthetic V/A/T triplets (fixed noise images, distinct
    tones, distinct captions), VALCE with all three pairs on, audio encoder
    tied to the image encoder (running.siamese). Loss must descend
    decisively and ALL THREE pairwise retrievals must reach high train-split
    R@1 — a tying bug, a view misalignment, or a pair-flag error passes
    every shape test but cannot pass this.
    (parity target: `/root/reference/cvap/model/cvalp.py:130-215`)"""
    n = 16
    make_synth_audioset(str(tmp_path), "as_train", n=n, seconds=1.05)
    make_synth_audioset_captions(str(tmp_path), "capembs", n=n, as_text=True)
    mon, losses = _run([
        "+running=trimodal",
        *TINY,
        "+model/loss=ce_val",
        "model.loss.lv=True",  # all three pairs: va, lv, al
        "model.text.freeze=False",  # trimodal training trains the text tower
        "worker=CVALP",
        "monitor=VALMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=as_train",
        "running.eval_name=as_train",  # memorization probe: eval ON train
        "running.test_name=",
        "running.clf=False",
        "running.text_emb=capembs",
        "running.siamese.alive=True",
        "running.siamese.amodules=[encoder]",
        "running.batch_size=8",
        "running.epochs=700",
        "running.eval_samples=16",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    assert ("audio/encoder", "image/encoder") in mon.ties  # siamese is ON
    initial, final = np.mean(losses[:2]), np.mean(losses[-6:])
    assert initial > 6.0, f"initial 3-pair loss suspiciously low: {initial}"
    assert final < 0.25 * initial, f"no descent: {initial} -> {final}"

    from vipant_tpu.eval import symmetric_retrieval

    data = mon.collect_features(mon.evalloader)
    v, a, l = data["x1"], data["x2"], data["x3"]
    for name, (x, y) in {
        "VA": (v, a), "AL": (a, l), "LV": (l, v),
    }.items():
        sym = symmetric_retrieval(x, y)
        assert sym["12"]["t1"] >= 85.0, f"{name} t1 {sym['12']['t1']} (chance {100 / n:.1f})"
        assert sym["21"]["t1"] >= 85.0, f"{name} reverse t1 {sym['21']['t1']}"


@pytest.mark.slow
def test_cvasp_multiview_overfit(tmp_path):
    """CVASP 5-way multi-view memorization (VERDICT r4 #1b): all five VACE
    loss flags on (vp, ap, va, vv, aa). The pivot/view image towers are
    frozen (and tied image_v->image), so the learnable signal is the audio
    tower matching the frozen anchors through the ap/va/aa pairs — loss must
    descend by the learnable share and the pivot-image<->audio retrieval
    must memorize. (parity target: `/root/reference/cvap/model/siamese_va.py:33-66`)

    Clip length: the siamese view pipeline hardcodes the REFERENCE'S mask
    widths (FbankViews: time 200/300 frames — 20/30% of its 10 s clips,
    `/root/reference/cvap/data/audio/transform.py:223-258`); at a 100-frame
    toy length those masks erase ~75-87% of every training view, so this
    test uses 5 s clips (500 frames) to keep the masked fraction at the
    reference's scale."""
    n = 16
    make_synth_va_index(str(tmp_path), "train", n=n, seconds=5.1)
    mon, losses = _run([
        "+running=siamese",
        *[o for o in TINY if not o.startswith("running.audio.max_len")],
        "running.audio.max_len=500",
        "+model/loss=ce_va",
        "model.loss.vp=True",
        "model.loss.ap=True",
        "model.loss.va=True",
        "model.loss.vv=True",
        "model.loss.aa=True",
        # the reference's clip_tf branch: deterministic CLIP image views
        # (synthetic noise images have no crop-invariant structure, so the
        # augmented-view branch's va target is unlearnable BY DATA — the
        # augmented pipeline itself is pinned by test_data/test_trainers)
        "running.clip_tf=True",
        "worker=CVASP",
        "monitor=VASMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=train",
        "running.eval_name=train",  # memorization probe: eval ON train
        "running.multi_view=True",
        "running.batch_size=8",
        "running.epochs=250",
        "running.eval_samples=16",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    assert mon.use_vv and mon.use_aa  # all five views flowed
    initial, final = np.mean(losses[:2]), np.mean(losses[-6:])
    # vp/vv ride frozen towers (their CE is a floor the optimizer can only
    # calibrate via logit scales); ap/va/aa must memorize
    assert final < 0.62 * initial, f"no descent: {initial} -> {final}"
    import re as _re

    report = mon.infer(mon.evalloader)
    i2a = float(_re.search(r"I->A: t1 = *([\d.]+)", report).group(1))
    a2i = float(_re.search(r"A->I: t1 = *([\d.]+)", report).group(1))
    assert i2a >= 85.0, f"I->A t1 {i2a} ({report})"
    assert a2i >= 85.0, f"A->I t1 {a2i} ({report})"


@pytest.mark.slow
def test_captioning_overfit_and_decode(tmp_path):
    """Captioning memorization (VERDICT r4 #1c): LM loss descent AND greedy
    decode reproducing the training captions exactly — the only falsifier
    for a shifted-label or cross-attention-memory bug (every mechanics test
    passes with labels off by one).
    (parity target: `/root/reference/cvap/module/encoder/text_head.py:80-107`)"""
    n = 8
    make_synth_clotho(str(tmp_path), "clotho_dev", n=n, seconds=1.05, identical_caps=True)
    mon, losses = _run([
        "+running=clotho",
        *TINY,
        "+model/text=transformer_decoder",
        "+model/loss=ce_lm",
        "model.text.freeze=False",
        "model.text.width=32",
        "model.text.heads=4",
        "model.text.layers=2",
        "model.text.mem_width=64",
        "model.text.max_len_dec=8",
        "model.text.embed_dim=32",
        "worker=CLAP",
        "monitor=LAMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=clotho_dev",
        "running.test_name=",
        "running.prompt=",
        "running.retrieval=False",
        "running.batch_size=8",
        "running.epochs=400",
        "running.eval_loss_bound=inf",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    initial, final = np.mean(losses[:2]), np.mean(losses[-6:])
    assert initial > 2.0, f"initial LM loss suspiciously low: {initial}"
    assert final < 0.35, f"LM did not memorize: {initial} -> {final}"

    # greedy decode must reproduce the gold captions: exact string match
    # through the real tokenizer round trip
    caps = mon.decode_captions(mon.evalloader, max_batches=10)
    from vipant_tpu.tokenizer import detokenize_ids, tokenize

    gold = [
        detokenize_ids(row)
        for row in tokenize([f"sound number {i}" for i in range(n)], as_list=True)
    ]
    hits = sum(c == g for c, g in zip(caps, gold))
    assert hits >= int(0.75 * n), f"exact-match {hits}/{n}: {list(zip(caps, gold))}"


@pytest.mark.slow
def test_patchout_overfit(tmp_path):
    """model.audio.patchout=0.25 is sold as a 39% speedup
    (docs/performance.md) — it changes the math (drops 25% of audio tokens
    per step), so it must still memorize (VERDICT r4 #2). Same bar as the
    plain CVAP overfit; eval runs patchout-free (train=False), so retrieval
    sees full sequences.

    lr stays at TINY's 2e-3: patchout's per-step token-drop noise makes
    4e-3 oscillate late in training (loss bouncing 0.05-2.4, the last-6
    mean lands either side of the bar run-to-run); at 2e-3 x 480 epochs the
    descent is monotone with a ~90x margin (measured final 0.012)."""
    n = 16
    make_synth_va_npz_index(str(tmp_path / "data"), "npz_train", n=n)
    mon, losses = _run([
        "+running=bimodal",
        *TINY,
        "+model/loss=ce",
        "model.audio.patchout=0.25",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/data",
        "running.data_name=npz_train",
        "running.eval_name=npz_train",
        "running.batch_size=8",
        "running.epochs=480",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    initial, final = np.mean(losses[:2]), np.mean(losses[-6:])
    assert initial > 3.0, f"initial loss suspiciously low: {initial}"
    assert final < 0.25 * initial, f"patchout killed descent: {initial} -> {final}"

    from vipant_tpu.eval import symmetric_retrieval

    data = mon.collect_features(mon.evalloader)
    sym = symmetric_retrieval(data["x1"], data["x2"])
    assert sym["12"]["t1"] >= 85.0, f"I->A R@1 {sym['12']['t1']} (chance {100 / n:.1f})"
    assert sym["21"]["t1"] >= 85.0, f"A->I R@1 {sym['21']['t1']}"


@pytest.mark.slow
def test_esc_supervised_beats_chance(tmp_path):
    """Supervised x-fold classification: 2 tone classes (250 vs 450 Hz) are
    trivially separable — the best-common-epoch mean accuracy must beat 50%
    chance decisively (measured: 100.0 with CE -> ~0.001). scaling=False
    avoids the x14.3 logit_scale turning tiny random-init logit differences
    into saturated CE (same rationale as the BCE test above)."""
    make_synth_esc50(str(tmp_path), n_per_class=6, seconds=1.05)
    cfg = compose([
        "+running=esc50",
        *TINY,
        "+model/loss=ce_cls",
        "model.loss.scaling=False",
        "worker=ESClassifier",
        "monitor=ESCMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=esc50",
        "running.zero_shot=False",
        "running.batch_size=4",
        "running.epochs=40",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    mean_p1 = mon.learn()  # best-common-epoch mean over folds, percent
    assert mean_p1 >= 85.0, f"fold accuracy {mean_p1} barely above 50% chance"
    losses = _losses(mon)
    assert np.mean(losses[-4:]) < 0.2, f"CE did not reach memorization: {losses[-4:]}"
