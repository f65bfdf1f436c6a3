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


def _timm_deit_sd(torch, width=64, layers=2, grid=196):
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
    return sd


def test_deit_audio_trainer_e2e(tmp_path):
    """CVAP one epoch with a DeiT audio tower reachable purely from the
    recipe grammar (+model/audio=deit) and "meme"-initialized from a local
    timm-layout .pth — the reference's ckpt > meme > CLIP init priority
    (`/root/reference/cvap/model/cvap.py:100-110`, `helper.py:52-63`)."""
    torch = pytest.importorskip("torch")
    import sys, os
    sys.path.insert(0, os.getcwd())
    from data_synth import make_synth_va_index
    from vipant_tpu.config import compose
    from vipant_tpu.train import build_monitor
    from vipant_tpu.ckpt.deit_port import port_deit

    make_synth_va_index(str(tmp_path / "data"), "train", n=4, seconds=1.05)
    meme = str(tmp_path / "deit_meme.pth")
    sd = _timm_deit_sd(torch, width=64, layers=2)
    torch.save(sd, meme)
    cfg = compose([
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=deit",
        "+model/text=dummy",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
        "model.image.width=64",
        "model.image.embed_dim=32",
        "model.image.encoder.layers=2",
        "model.image.heads=4",
        "model.audio.width=64",
        "model.audio.heads=4",
        "model.audio.layers=2",
        "model.audio.stride=[10,12]",
        f"model.audio.meme_path={meme}",
        "running.audio.max_len=100",
        "optimizer.use_lars=False",
        "optimizer.warmup=False",
        "verbose=False",
        "num_proc=2",
        "mesh.data=1",
        "worker=CVAP",
        "monitor=VAMonitor",
        f"running.data_root={tmp_path}/data",
        "running.data_name=train",
        "running.eval_name=",
        "running.batch_size=4",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])
    mon = build_monitor(cfg)
    # the audio tower must carry the ported meme weights, not random init
    ported = port_deit(sd, mon.model.audio)["params"]
    audio_params = mon.state.full_params()["audio"]
    np.testing.assert_allclose(
        np.asarray(audio_params["pos_embed"]), ported["pos_embed"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(audio_params["blocks"]["block_0"]["attn"]["qkv"]["kernel"]),
        ported["blocks"]["block_0"]["attn"]["qkv"]["kernel"],
        atol=1e-6,
    )
    mon.epoch(0)  # one real step; halt_on_nan guards the loss
    assert mon.global_step == 1


def test_legacy_group_aliases_compose():
    """Every legacy reference config group (`model/{image,audio}/vit`,
    `model/text/transformer`, `model/audio/deit`) composes and builds
    (parity: /root/reference/configs/model/ group tree)."""
    from vipant_tpu.config import compose
    from vipant_tpu.models import build_main_model, init_model

    cfg = compose([
        "+running=bimodal",
        "+model/image=vit",
        "+model/audio=vit",
        "+model/text=transformer",
        "+model/loss=ce",
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
        "worker=CVAP",
    ])
    assert cfg.model.image.name == "ImageHead"
    assert cfg.model.audio.name == "NaiveCLIPAudioHead"
    assert cfg.model.text.name == "TextHead"
    assert list(cfg.model.audio.pre_encoder.stride) == [16, 16]
    assert int(cfg.model.audio.pre_encoder.in_channels) == 1
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    assert "audio" in variables["params"]


def test_released_recipe_override_sets_compose():
    """The released reference run scripts' override sets compose verbatim
    (`/root/reference/bash/run_bimodal_va.sh:24-31`,
    `run_bimodal_at.sh:27-40`)."""
    from vipant_tpu.config import compose

    va = compose([
        "+running=bimodal",
        "+model/image=vit_val", "+model/audio=vit_val", "+model/text=dummy",
        "+model/loss=ce", "+optimizer=standard", "+running/audio=default",
        "model.audio.pre_encoder.in_channels=3",
        "model.audio.pre_encoder.stride=[16,24]",
        "worker=CVAP", "monitor=VAMonitor",
    ])
    assert list(va.model.audio.pre_encoder.stride) == [16, 24]
    at = compose([
        "+running=clotho",
        "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=transformer_val",
        "+model/loss=ce_val", "+optimizer=standard", "+running/audio=default",
        "model.audio.pre_encoder.in_channels=3",
        "model.audio.pre_encoder.stride=[16,24]",
        "worker=CLAP", "monitor=LAMonitor",
    ])
    assert at.model.text.name == "CLIPTextHead"
