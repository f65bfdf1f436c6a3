"""Port a fabricated reference-format .pth checkpoint (tuple-of-state-dicts,
naive + MetaHead namings) and verify embedding parity with the torch oracle."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vipant_tpu.ckpt import (  # noqa: E402
    load_torch_file,
    port_reference_audio,
    port_reference_text,
    reference_loss_params,
    split_reference_checkpoint,
)
from vipant_tpu.nn import TextTower, VisionTower  # noqa: E402

from torch_oracle import TorchText, TorchVisual  # noqa: E402


def _naive_audio_sd(visual: TorchVisual) -> dict:
    """Reference 'naive' audio head: VisualTransformer nested under
    ``encoder.`` (`/root/reference/cvap/module/encoder/audio_head.py:136-162`)."""
    return {f"encoder.{k}": v for k, v in visual.state_dict().items()}


def _metahead_text_sd(text: TorchText) -> dict:
    """Reference MetaHead text layout
    (`/root/reference/cvap/module/encoder/clip_head.py`)."""
    sd = {}
    for k, v in text.state_dict().items():
        if k == "token_embedding.weight":
            sd["pre_encoder.token_embedding.weight"] = v
        elif k == "positional_embedding":
            sd["misc.positional_embedding"] = v
        elif k.startswith("transformer.resblocks."):
            sd[k.replace("transformer.", "encoder.")] = v
        elif k.startswith("ln_final."):
            sd[k.replace("ln_final.", "post_encoder.ln.")] = v
        elif k == "text_projection":
            sd["post_encoder.proj"] = v
    return sd


def test_two_tuple_checkpoint_roundtrip(tmp_path):
    """(audio, loss) checkpoint: ported audio tower must reproduce the torch
    oracle's embeddings on a 1-channel mel input (channel collapse at
    forward, identical grid)."""
    torch.manual_seed(0)
    # build the oracle at an "audio" geometry: square 224 grid for exact parity
    visual = TorchVisual(width=64, layers=2, heads=4, embed_dim=32).eval()
    audio_sd = _naive_audio_sd(visual)
    loss_sd = {"logit_scale": torch.tensor(1.2345)}
    ckpt = {"cfg": {"note": "synthetic"}, "model": (audio_sd, loss_sd)}
    path = str(tmp_path / "00000010.pth")
    torch.save(ckpt, path)

    cfg, payload = load_torch_file(path)
    parts = split_reference_checkpoint(payload)
    assert set(parts) == {"audio", "loss"}

    tower = VisionTower(width=64, embed_dim=32, resolution=224, heads=4, layers=2)
    variables = port_reference_audio(parts["audio"], tower, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    ours = np.asarray(tower.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = visual(torch.from_numpy(x)).numpy()
    cos = np.sum(ours * ref, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 1 - 1e-5

    extra = reference_loss_params(parts["loss"])
    assert extra["logit_scale"] == pytest.approx(1.2345)


def test_four_tuple_checkpoint_with_metahead_text(tmp_path):
    torch.manual_seed(1)
    visual = TorchVisual(width=64, layers=2, heads=4, embed_dim=32).eval()
    text = TorchText(width=32, layers=2, heads=4, embed_dim=32).eval()
    ckpt = {
        "cfg": None,
        "model": (
            {f"encoder.{k}": v for k, v in visual.state_dict().items()},
            _naive_audio_sd(visual),
            _metahead_text_sd(text),
            {"logit_scale": torch.tensor(0.5)},
        ),
    }
    path = str(tmp_path / "00000020.pth")
    torch.save(ckpt, path)
    _, payload = load_torch_file(path)
    parts = split_reference_checkpoint(payload)
    assert set(parts) == {"image", "audio", "text", "loss"}

    ttower = TextTower(width=32, embed_dim=32, heads=4, layers=2)
    tvars = port_reference_text(parts["text"], ttower)
    ids = np.zeros((2, 77), np.int64)
    ids[:, 0], ids[:, 1], ids[:, 2] = 49406, 320, 49407
    ours = np.asarray(ttower.apply(tvars, jnp.asarray(ids.astype(np.int32))))
    with torch.no_grad():
        ref = text(torch.from_numpy(ids)).numpy()
    cos = np.sum(ours * ref, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 1 - 1e-5
