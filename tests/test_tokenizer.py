import os
import sys
import types

import numpy as np
import pytest

from vipant_tpu.tokenizer import get_tokenizer, tokenize

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_tokenizer():
    """Reference tokenizer as a test oracle (skipped when unavailable)."""
    if not os.path.isdir(os.path.join(REF, "clip")):
        pytest.skip("reference repo not available")
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:  # identity shim: our inputs are clean ASCII
            shim = types.ModuleType("ftfy")
            shim.fix_text = lambda s: s
            sys.modules["ftfy"] = shim
    # load the module file directly; the clip package __init__ pulls torch deps
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_simple_tokenizer", os.path.join(REF, "clip", "simple_tokenizer.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer()


SAMPLES = [
    "the sound of a dog barking",
    "a photo of a cat.",
    "The sound of rain, thunder & WIND!!",
    "birds chirping; water flowing... 123 go",
    "it's a man's world — isn't it?",
    "",
    "don't stop",
]


def test_vocab_size():
    assert get_tokenizer().vocab_size == 49408


def test_special_tokens():
    tk = get_tokenizer()
    assert tk.sot_token == 49406
    assert tk.eot_token == 49407


def test_golden_vs_reference(ref_tokenizer):
    tk = get_tokenizer()
    for text in SAMPLES:
        if not text:
            continue
        assert tk.encode(text) == ref_tokenizer.encode(text), text


def test_roundtrip():
    tk = get_tokenizer()
    for text in ["the sound of rain", "hello world"]:
        assert tk.decode(tk.encode(text)).strip() == text
    # digits tokenize one-by-one, each with an end-of-word marker
    assert tk.decode(tk.encode("take 42")).strip() == "take 4 2"


def test_tokenize_shapes():
    arr = tokenize(["a dog", "a longer caption about many things"], context_length=77)
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == 49406
    assert 49407 in arr[0]


def test_tokenize_as_list_ragged():
    out = tokenize(["a", "a b c d"], as_list=True)
    assert isinstance(out, list)
    assert len(out[0]) < len(out[1])
    assert out[0][0] == 49406 and out[0][-1] == 49407


def test_tokenize_too_long():
    with pytest.raises(RuntimeError):
        tokenize("word " * 100, context_length=16)
