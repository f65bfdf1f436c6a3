import pytest

from vipant_tpu.config import Config, compose


def test_compose_defaults():
    cfg = compose()
    assert cfg.monitor == "VAMonitor"
    assert cfg.worker == "CVAP"
    assert cfg.seed == 1213


def test_group_composition_and_interpolation():
    cfg = compose([
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=transformer_val",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
    ])
    # interpolation across groups
    assert cfg.model.audio.width == 768
    assert cfg.model.audio.embed_dim == 512
    assert cfg.running.embed_dim == 512
    assert cfg.model.audio.resolution == [1000, 128]
    assert cfg.model.image.pre_encoder.stride == 32
    assert cfg.optimizer.batch_size == 432


def test_overrides_seen_by_interpolation():
    cfg = compose([
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=transformer_val",
        "+running/audio=default",
        "model.audio.pre_encoder.stride=[16,24]",
        "running.audio.max_len=1800",
        "running.batch_size=8",
    ])
    assert cfg.model.audio.pre_encoder.stride == [16, 24]
    # lazy interpolation: override of running.audio.max_len propagates
    assert cfg.model.audio.resolution == [1800, 128]
    assert cfg.running.batch_size == 8


def test_value_parsing():
    cfg = compose(["eval=False", "seed=42", "model_file=abc.pth"])
    assert cfg.eval is False
    assert cfg.seed == 42
    assert cfg.model_file == "abc.pth"


def test_missing_key_raises():
    cfg = Config({"a": {"b": 1}})
    assert cfg.a.b == 1
    with pytest.raises(AttributeError):
        _ = cfg.a.c
    assert cfg.a.get("c", 7) == 7


def test_set_and_serialize():
    cfg = Config({"x": 1, "y": {"z": "${x}"}})
    assert cfg.y.z == 1
    cfg.set_path("x", 5)
    assert cfg.y.z == 5
    d = cfg.to_dict(resolve=True)
    assert d == {"x": 5, "y": {"z": 5}}


def test_leading_zero_values_stay_strings():
    """YAML 1.1 reads 00000005 as octal 5 — checkpoint-step names must
    survive CLI overrides verbatim."""
    from vipant_tpu.config import compose

    cfg = compose(["model_file=00000005", "seed=5"])
    assert cfg.model_file == "00000005"
    assert cfg.seed == 5  # plain ints still coerce
