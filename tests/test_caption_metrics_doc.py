"""Pins the caption-metric decision record (docs/caption_metrics.md): the
METEOR synonym-stage delta on the documented worked set, the zero-delta
guarantee for captions without synonym-only pairs, and the absence of any
number labeled SPICE/SPIDEr in the caption report. Reference context:
`/root/reference/cvap/module/decoder/loss_more.py:20-24,328-371` (the
optional coco_caption suite including SPICE/SPIDEr)."""

import pytest

from vipant_tpu.eval.metrics import cider_d, corpus_bleu, meteor, rouge_l

CANDS = [
    "a kid is laughing loudly",
    "a dog barks at a passing car",
    "rain falls on a sofa by the window",
    "a man speaks over soft music",
    "an automobile engine idles then revs",
    "children sing a song together",
    "a canine growls and then whimpers",
    "water pours into a glass",
]
REFS = [
    ["a child is laughing loudly"],
    ["a dog barks at a passing automobile"],
    ["rain falls on a couch by the window"],
    ["a man speaks over soft music"],
    ["a car engine idles then revs"],
    ["kids sing a song together"],
    ["a dog growls and then whimpers"],
    ["water pours into a cup"],
]

SYN = {}
for gid, group in enumerate(
    [
        ("kid", "child", "kids", "children"),
        ("sofa", "couch"),
        ("car", "automobile"),
        ("dog", "canine"),
        ("glass", "cup"),
    ]
):
    for w in group:
        SYN[w] = gid


def test_meteor_worked_set_pinned_values():
    """The exact numbers in docs/caption_metrics.md."""
    assert meteor(CANDS, REFS) == pytest.approx(81.5408, abs=1e-3)
    assert meteor(CANDS, REFS, synonyms=SYN) == pytest.approx(97.6367, abs=1e-3)
    # the documented single-sentence example
    assert meteor([CANDS[0]], [REFS[0]]) == pytest.approx(75.0, abs=1e-3)
    assert meteor([CANDS[0]], [REFS[0]], synonyms=SYN) == pytest.approx(
        99.6, abs=1e-3
    )


def test_meteor_delta_zero_without_synonym_pairs():
    """Captions with no synonym-only alignment score IDENTICALLY with and
    without the synonym stage — the delta is not a global shift."""
    plain = [
        ("a man speaks over soft music", ["a man speaks over soft music"]),
        ("dogs barking in the distance", ["a dog barks far away"]),
        ("loud thunder and heavy rain", ["thunder rumbles with rain"]),
    ]
    c = [p[0] for p in plain]
    r = [p[1] for p in plain]
    assert meteor(c, r) == meteor(c, r, synonyms=SYN)


def test_meteor_synonym_stage_never_lowers():
    """The synonym stage can only ADD alignments on top of exact+stem, so
    the default score is a floor (the documented 'always downward' bias)."""
    for cand, refs in zip(CANDS, REFS):
        assert meteor([cand], [refs], synonyms=SYN) >= meteor([cand], [refs])


def test_caption_suite_has_no_spice_or_spider():
    """Decision record: no number is ever emitted under the SPICE or SPIDEr
    name (a CIDEr-only value under the SPIDEr label would mislead). This
    mirrors the exact score assembly of LATrainer.caption_report
    (train/monitors.py)."""
    scores = corpus_bleu(CANDS, REFS)
    scores["ROUGE-L"] = rouge_l(CANDS, REFS)
    scores["METEOR"] = meteor(CANDS, REFS)
    scores["CIDEr-D"] = cider_d(CANDS, REFS)
    keys = " ".join(scores).lower()
    assert "spice" not in keys and "spider" not in keys
    assert "CIDEr-D" in scores and "METEOR" in scores
