"""Porter + tower parity vs the torch oracle — the embedding-parity gate of
SURVEY.md §7 step 3 (cosine > 1 − 1e-5 in fp32)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vipant_tpu.ckpt.clip_port import (  # noqa: E402
    port_audio_from_audio,
    port_clip_text,
    port_clip_visual,
    split_clip_state_dict,
)
from vipant_tpu.nn import TextTower, VisionTower  # noqa: E402

from torch_oracle import TorchText, TorchVisual, clip_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    visual = TorchVisual(width=64, layers=2, heads=4, embed_dim=32).eval()
    text = TorchText(width=32, layers=2, heads=4, embed_dim=32).eval()
    return visual, text, clip_state_dict(visual, text)


def cosine(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(
        np.min(
            np.sum(a * b, -1)
            / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        )
    )


def test_image_tower_parity(oracle):
    visual, _, sd = oracle
    visual_sd, _ = split_clip_state_dict(sd)
    tower = VisionTower(width=64, embed_dim=32, resolution=224, heads=4, layers=2)
    variables = port_clip_visual(visual_sd, tower)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 3, 224, 224)).astype(np.float32)
    ours = np.asarray(tower.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = visual(torch.from_numpy(x)).numpy()
    assert cosine(ours, ref) > 1 - 1e-5
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_text_tower_parity(oracle):
    _, text, sd = oracle
    _, text_sd = split_clip_state_dict(sd)
    tower = TextTower(width=32, embed_dim=32, heads=4, layers=2)
    variables = port_clip_text(text_sd, tower)

    rng = np.random.default_rng(1)
    ids = np.zeros((4, 77), dtype=np.int64)
    for i in range(4):
        n = rng.integers(3, 20)
        ids[i, 0] = 49406
        ids[i, 1 : n - 1] = rng.integers(1, 49000, n - 2)
        ids[i, n - 1] = 49407
    ours = np.asarray(tower.apply(variables, jnp.asarray(ids.astype(np.int32))))
    with torch.no_grad():
        ref = text(torch.from_numpy(ids)).numpy()
    assert cosine(ours, ref) > 1 - 1e-5


def test_audio_tower_from_visual(oracle):
    """CLIP image weights re-gridded onto a rectangular audio grid: output
    must be finite and the pos-emb grid must match the audio layout."""
    visual, _, sd = oracle
    visual_sd, _ = split_clip_state_dict(sd)
    tower = VisionTower(
        width=64, embed_dim=32, resolution=(100, 128), heads=4, layers=2,
        patch_size=32, stride=(16, 24), in_channels=3,
    )
    variables = port_clip_visual(visual_sd, tower, use_slice=False)
    pos = variables["params"]["misc"]["positional_embedding"]
    assert pos.shape == (5 * 5 + 1, 64)

    x = np.random.default_rng(0).standard_normal((2, 1, 100, 128)).astype(np.float32)
    out = np.asarray(tower.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 32)
    assert np.isfinite(out).all()


def test_audio_retarget_slice_and_interp(oracle):
    """10s→18s retarget: freq axis equal → slice path; changed freq → interp."""
    visual, _, sd = oracle
    visual_sd, _ = split_clip_state_dict(sd)
    t10 = VisionTower(
        width=64, embed_dim=32, resolution=(1000, 128), heads=4, layers=2,
        patch_size=32, stride=(16, 24), in_channels=3,
    )
    v10 = port_clip_visual(visual_sd, t10, use_slice=False)
    t18 = VisionTower(
        width=64, embed_dim=32, resolution=(1800, 128), heads=4, layers=2,
        patch_size=32, stride=(16, 24), in_channels=3,
    )
    v18p = port_audio_from_audio(v10["params"], t10.grid, t18, use_slice=True)
    assert v18p["misc"]["positional_embedding"].shape[0] == t18.grid[0] * t18.grid[1] + 1
    # downsize along time with equal freq → slice path reuses exact rows
    t5 = VisionTower(
        width=64, embed_dim=32, resolution=(500, 128), heads=4, layers=2,
        patch_size=32, stride=(16, 24), in_channels=3,
    )
    v5p = port_audio_from_audio(v10["params"], t10.grid, t5, use_slice=True)
    pos10 = np.asarray(v10["params"]["misc"]["positional_embedding"])
    pos5 = np.asarray(v5p["misc"]["positional_embedding"])
    ncol = t10.grid[1]
    start = 6 * ncol + 1
    need = t5.grid[0] * t5.grid[1]
    assert np.allclose(pos5[1:], pos10[start : start + need])
