import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.nn.deit import DeiTTower
from vipant_tpu.nn.heads import AUDIO_HEADS, IMAGE_HEADS


def test_registered():
    assert "DeiTImageHead" in IMAGE_HEADS
    assert "NaiveDeiTAudioHead" in AUDIO_HEADS


def test_deit_image_tower(rng):
    tower = DeiTTower(width=64, embed_dim=32, resolution=224, patch_size=16, heads=4, layers=2)
    x = jnp.asarray(rng.standard_normal((2, 3, 224, 224)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x)
    assert out.shape == (2, 32)
    # 14×14 grid + cls + dist
    assert params["params"]["pos_embed"].shape == (198, 64)


def test_deit_audio_tower_rect(rng):
    tower = DeiTTower(
        width=64, embed_dim=32, resolution=(100, 128), patch_size=16,
        stride=(10, 12), in_channels=3, heads=4, layers=2,
    )
    x = jnp.asarray(rng.standard_normal((2, 1, 100, 128)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x, normalized=True)
    assert out.shape == (2, 32)
    assert np.allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_deit_port_from_timm_layout(rng):
    torch = pytest.importorskip("torch")
    from vipant_tpu.ckpt.deit_port import port_deit

    width, layers = 64, 2
    grid = 196
    sd = {
        "pos_embed": torch.randn(1, grid + 2, width),
        "cls_token": torch.randn(1, 1, width),
        "dist_token": torch.randn(1, 1, width),
        "patch_embed.proj.weight": torch.randn(width, 3, 16, 16),
        "patch_embed.proj.bias": torch.randn(width),
        "norm.weight": torch.ones(width),
        "norm.bias": torch.zeros(width),
        "head.weight": torch.randn(1000, width),
        "head_dist.weight": torch.randn(1000, width),
    }
    for i in range(layers):
        sd.update({
            f"blocks.{i}.attn.qkv.weight": torch.randn(3 * width, width),
            f"blocks.{i}.attn.qkv.bias": torch.randn(3 * width),
            f"blocks.{i}.attn.proj.weight": torch.randn(width, width),
            f"blocks.{i}.attn.proj.bias": torch.randn(width),
            f"blocks.{i}.norm1.weight": torch.ones(width),
            f"blocks.{i}.norm1.bias": torch.zeros(width),
            f"blocks.{i}.norm2.weight": torch.ones(width),
            f"blocks.{i}.norm2.bias": torch.zeros(width),
            f"blocks.{i}.mlp.fc1.weight": torch.randn(4 * width, width),
            f"blocks.{i}.mlp.fc1.bias": torch.randn(4 * width),
            f"blocks.{i}.mlp.fc2.weight": torch.randn(width, 4 * width),
            f"blocks.{i}.mlp.fc2.bias": torch.randn(width),
        })
    tower = DeiTTower(
        width=width, embed_dim=32, resolution=(100, 128), patch_size=16,
        stride=(10, 12), heads=4, layers=layers,
    )
    variables = port_deit(sd, tower)
    g = tower.grid
    assert variables["params"]["pos_embed"].shape == (g[0] * g[1] + 2, width)
    x = jnp.asarray(rng.standard_normal((1, 1, 100, 128)), jnp.float32)
    out = tower.apply(variables, x)
    assert np.isfinite(np.asarray(out)).all()
