"""Offline CLIP zoo surface: names, resolution, sha256 verification
(the offline half of `/root/reference/clip/clip.py:18-57`)."""

import hashlib

import pytest

from vipant_tpu.ckpt import zoo


def test_available_models():
    names = zoo.available_models()
    assert names == ["RN50", "RN101", "RN50x4", "RN50x16", "ViT-B32", "ViT-B16"]


def test_resolve_unknown_name(tmp_path):
    assert zoo.resolve("NotAModel", str(tmp_path)) is None


def test_resolve_verifies_sha256(tmp_path, monkeypatch):
    payload = b"fabricated clip weights"
    digest = hashlib.sha256(payload).hexdigest()
    monkeypatch.setitem(zoo._MODELS, "Fake-B32", ("Fake-B-32.pt", digest))

    # missing artifact names the canonical file
    with pytest.raises(FileNotFoundError, match="Fake-B-32.pt"):
        zoo.resolve("Fake-B32", str(tmp_path))

    good = tmp_path / "Fake-B-32.pt"
    good.write_bytes(payload)
    assert zoo.resolve("Fake-B32", str(tmp_path)) == str(good)

    good.write_bytes(b"corrupted")
    with pytest.raises(RuntimeError, match="SHA256"):
        zoo.resolve("Fake-B32", str(tmp_path))
    # verification can be disabled explicitly
    assert zoo.resolve("Fake-B32", str(tmp_path), verify=False) == str(good)


def test_clip_weights_path_uses_zoo(tmp_path, monkeypatch):
    from vipant_tpu.ckpt.loading import clip_weights_path
    from vipant_tpu.config import Config

    payload = b"zoo artifact"
    digest = hashlib.sha256(payload).hexdigest()
    monkeypatch.setitem(zoo._MODELS, "Fake-B32", ("Fake-B-32.pt", digest))
    (tmp_path / "Fake-B-32.pt").write_bytes(payload)
    cfg = Config(
        {"running": {"clip_model_root": str(tmp_path), "clip_model_name": "Fake-B32"}}
    )
    assert clip_weights_path(cfg) == str(tmp_path / "Fake-B-32.pt")

    # digest mismatch: warn and treat as custom (fine-tuned) weights via
    # the plain {root}/{name}.pt convention — here that candidate is
    # absent, so resolution yields None rather than raising
    (tmp_path / "Fake-B-32.pt").write_bytes(b"oops")
    with pytest.warns(UserWarning, match="SHA256"):
        assert clip_weights_path(cfg) is None
    # a user's own weights under the name convention keep loading
    (tmp_path / "Fake-B32.pt").write_bytes(b"finetuned")
    with pytest.warns(UserWarning, match="SHA256"):
        assert clip_weights_path(cfg) == str(tmp_path / "Fake-B32.pt")

    # non-zoo names keep the plain {root}/{name}.pt convention, no digest
    (tmp_path / "my_finetune.pt").write_bytes(b"anything")
    cfg2 = Config(
        {"running": {"clip_model_root": str(tmp_path), "clip_model_name": "my_finetune"}}
    )
    assert clip_weights_path(cfg2) == str(tmp_path / "my_finetune.pt")
