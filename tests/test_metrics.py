import numpy as np
import pytest

from vipant_tpu.eval import (
    multilabel_report,
    one_vs_k_retrieval,
    retrieval_metrics,
    symmetric_retrieval,
    zero_shot_classification,
)


def test_retrieval_metrics_basic():
    ranks = np.array([0, 0, 4, 9, 49, 100])
    m = retrieval_metrics(ranks)
    assert m["R@1"] == pytest.approx(2 / 6 * 100)
    assert m["R@5"] == pytest.approx(3 / 6 * 100)
    assert m["R@10"] == pytest.approx(4 / 6 * 100)
    assert m["R@50"] == pytest.approx(5 / 6 * 100)
    assert m["MED"] == 7.5
    assert m["AVG"] == pytest.approx(ranks.mean() + 1)


def test_symmetric_retrieval_identity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((10, 8))
    m = symmetric_retrieval(x, x.copy())
    assert m["12"]["t1"] == 100.0
    assert m["21"]["t1"] == 100.0


def test_one_vs_k_identity():
    rng = np.random.default_rng(0)
    n, k, d = 6, 5, 8
    audio = rng.standard_normal((n, d))
    caps = np.repeat(audio, k, axis=0) + 1e-4 * rng.standard_normal((n * k, d))
    m = one_vs_k_retrieval(audio, caps, k=k)
    # every audio's top-5 are its own captions
    assert m["a2t"]["t5"] == 100.0
    assert m["t2a"]["t1"] == 100.0
    assert m["ref_a2t"]["R@1"] == 100.0


def test_one_vs_k_shuffled_is_worse():
    rng = np.random.default_rng(1)
    n, k, d = 8, 5, 8
    audio = rng.standard_normal((n, d))
    caps = rng.standard_normal((n * k, d))
    m = one_vs_k_retrieval(audio, caps, k=k)
    assert m["a2t"]["t1"] < 100.0


def test_zero_shot_with_prompt_collapse():
    # 2 classes, 2 prompts each; class embeddings at orthogonal corners
    text = np.array([[1, 0], [0.9, 0.1], [0, 1], [0.1, 0.9]], dtype=np.float64)
    label_map = {0: 0, 1: 0, 2: 1, 3: 1}
    audio = np.array([[1, 0.05], [0.02, 1.0], [0.8, 0.1]], dtype=np.float64)
    labels = np.array([0, 1, 0])
    p1 = zero_shot_classification(audio, text, labels, label_map)
    assert p1 == 100.0


def test_multilabel_report_perfect():
    labels = np.array([[1, 0], [0, 1], [1, 1], [0, 0]])
    scores = labels.astype(np.float64) * 0.9 + 0.05
    m = multilabel_report(scores, labels)
    assert m["Mac-AP"] == pytest.approx(100.0)
    assert m["mAUC"] == pytest.approx(100.0)
    assert m["Mic-AP"] == pytest.approx(100.0)


def test_multilabel_report_class_without_positives():
    """A class with no positive example in the (possibly eval_samples-capped)
    subset: modern sklearn returns nan from roc_auc_score instead of raising,
    which must not poison the mAUC mean (regression: mAUC = nan on every
    capped AudioSet report)."""
    labels = np.array([[1, 0, 0], [0, 1, 0], [1, 0, 0], [0, 1, 0]])  # class 2 empty
    scores = np.random.default_rng(0).random((4, 3))
    m = multilabel_report(scores, labels)
    assert np.isfinite(m["mAUC"])
    assert np.isfinite(m["mAP"]) if "mAP" in m else True


def test_porter_stemmer_known_values():
    from vipant_tpu.eval.metrics import _porter_stem

    for word, stem in [
        ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
        ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
        ("motoring", "motor"), ("sitting", "sit"), ("conflated", "conflat"),
        ("happy", "happi"), ("relational", "relat"), ("conditional", "condit"),
        ("hopefulness", "hope"), ("formalize", "formal"),
        ("adjustment", "adjust"), ("probate", "probat"), ("rate", "rate"),
        ("controlling", "control"),
    ]:
        assert _porter_stem(word) == stem, (word, _porter_stem(word), stem)


def test_meteor_values():
    """Hand-computed METEOR values (alpha=.9, beta=3, gamma=.5)."""
    from vipant_tpu.eval.metrics import meteor

    # identical sentence: F=1, 1 chunk of 3 matches -> 1 - 0.5*(1/3)^3
    v = meteor(["the cat sat"], [["the cat sat"]])
    assert abs(v - (1 - 0.5 * (1 / 3) ** 3) * 100) < 1e-6, v
    # stem-stage matches: dogs/dog running/runs align via Porter stems;
    # contiguous -> 1 chunk of 2: 1 - 0.5*(1/2)^3 = 0.9375
    v = meteor(["dogs running"], [["dog runs"]])
    assert abs(v - 93.75) < 1e-6, v
    # no overlap -> 0; empty corpus -> 0
    assert meteor(["xyz"], [["abc def"]]) == 0.0
    assert meteor([], []) == 0.0
    # fragmentation penalty: reversed bigrams break contiguity
    contiguous = meteor(["a b c d"], [["a b c d"]])
    fragmented = meteor(["c d a b"], [["a b c d"]])
    assert fragmented < contiguous
    # max over references picks the better one
    v = meteor(["the cat sat"], [["entirely different words", "the cat sat"]])
    assert abs(v - (1 - 0.5 * (1 / 3) ** 3) * 100) < 1e-6
