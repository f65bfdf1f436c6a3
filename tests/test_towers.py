import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.nn import TextTower, VisionTower, build_audio_head, build_image_head, build_text_head
from vipant_tpu.nn.tying import apply_ties, prune_tied, restore_tied


def small_cfg(stride=None):
    ov = [
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=transformer_val",
        "+running/audio=default",
        # shrink for tests
        "model.image.width=64",
        "model.image.embed_dim=32",
        "model.image.encoder.layers=2",
        "model.image.heads=4",
        "model.text.width=32",
        "model.text.heads=4",
        "model.text.encoder.layers=2",
        "running.audio.max_len=100",
    ]
    if stride:
        ov.append(f"model.audio.pre_encoder.stride={stride}")
    return compose(ov)


def test_image_tower_shapes():
    cfg = small_cfg()
    tower = build_image_head(cfg.model.image)
    x = jnp.zeros((2, 3, 224, 224))
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x)
    assert out.shape == (2, 32)
    # grid: 224/32 = 7 → 50 positions
    assert params["params"]["misc"]["positional_embedding"].shape == (50, 64)


def test_audio_tower_rect_grid():
    cfg = small_cfg(stride="[16,24]")
    tower = build_audio_head(cfg.model.audio)
    # (100-32)//16+1 = 5 rows, (128-32)//24+1 = 5 cols
    assert tower.grid == (5, 5)
    x = jnp.zeros((2, 1, 100, 128))  # 1-channel input vs 3-channel kernel
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x)
    assert out.shape == (2, 32)
    assert params["params"]["pre"]["kernel"].shape == (32, 32, 3, 64)


def test_text_tower_eot_pooling():
    cfg = small_cfg()
    tower = build_text_head(cfg.model.text)
    ids = np.zeros((2, 77), dtype=np.int32)
    ids[0, 0], ids[0, 1], ids[0, 2] = 49406, 320, 49407
    ids[1, 0], ids[1, 1] = 49406, 49407
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    out = tower.apply(params, jnp.asarray(ids))
    assert out.shape == (2, 32)
    # EOT position differs per row yet output is finite and differs
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(out[0], out[1])


def test_text_causality():
    """Tokens after EOT must not influence the pooled embedding."""
    cfg = small_cfg()
    tower = build_text_head(cfg.model.text)
    ids = np.zeros((1, 77), dtype=np.int32)
    ids[0, :3] = [49406, 320, 49407]
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    out1 = tower.apply(params, jnp.asarray(ids))
    ids2 = ids.copy()
    ids2[0, 5:] = 123  # garbage strictly after EOT
    out2 = tower.apply(params, jnp.asarray(ids2))
    assert np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_normalized_flag():
    cfg = small_cfg()
    tower = build_image_head(cfg.model.image)
    x = jnp.ones((2, 3, 224, 224))
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x, normalized=True)
    assert np.allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_require_feature():
    cfg = small_cfg()
    tower = build_image_head(cfg.model.image)
    x = jnp.ones((2, 3, 224, 224))
    params = tower.init(jax.random.PRNGKey(0), x)
    emb, feat = tower.apply(params, x, require_feature=True)
    assert emb.shape == (2, 32)
    assert feat.shape == (2, 7, 7, 64)  # [B, grid_h, grid_w, width]


def test_resnet_tower():
    cfg = compose([
        "+running=bimodal",
        "+model/image=rn50_val",
        "+model/text=transformer_val",
        "model.image.width=16",
        "model.image.embed_dim=32",
        "model.image.heads=8",
        "model.image.encoder.layers=[1,1,1,1]",
    ])
    tower = build_image_head(cfg.model.image)
    x = jnp.zeros((1, 3, 224, 224))
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x)
    assert out.shape == (1, 32)
    assert tower.grid == (7, 7)


def test_siamese_tying():
    """Audio tower tied to the image tower's misc params: one canonical
    copy, re-gridded on the fly inside the audio forward."""
    cfg = small_cfg(stride="[16,24]")
    image = build_image_head(cfg.model.image)
    audio = VisionTower(
        width=64, embed_dim=32, resolution=(100, 128), heads=4, layers=2,
        patch_size=32, stride=(16, 24), in_channels=3,
        misc_stored_grid=(7, 7),  # stored at the image grid
    )
    xi = jnp.zeros((1, 3, 224, 224))
    xa = jnp.zeros((1, 1, 100, 128))
    pi = image.init(jax.random.PRNGKey(0), xi)["params"]
    pa = audio.init(jax.random.PRNGKey(1), xa)["params"]
    assert pa["misc"]["positional_embedding"].shape == (50, 64)

    params = {"image": pi, "audio": pa}
    ties = [("audio/misc", "image/misc")]
    pruned = prune_tied(params, ties)
    assert "misc" not in pruned["audio"]
    full = restore_tied(pruned, ties)
    assert full["audio"]["misc"]["positional_embedding"] is full["image"]["misc"]["positional_embedding"]
    out = audio.apply({"params": full["audio"]}, xa)
    assert out.shape == (1, 32)

    # gradient w.r.t. the canonical copy flows through both towers
    def loss_fn(p):
        p = restore_tied(p, ties)
        a = audio.apply({"params": p["audio"]}, xa)
        i = image.apply({"params": p["image"]}, xi)
        return jnp.sum(a) + jnp.sum(i)

    g = jax.grad(loss_fn)(pruned)
    assert np.abs(np.asarray(g["image"]["misc"]["positional_embedding"])).sum() > 0


def test_vit_grid_square_with_custom_stride():
    """A square input with an overlapping stride must use the stride
    formula, not resolution // patch (regression: pos-emb rows vs patch
    count mismatch)."""
    from vipant_tpu.nn.stages import vit_grid

    grid, patch, stride = vit_grid(224, 16, 10)
    assert grid == ((224 - 16) // 10 + 1,) * 2 == (21, 21)
    # CLIP behavior unchanged when stride == patch
    grid, _, _ = vit_grid(224, 32)
    assert grid == (7, 7)


def test_token_pack_exact_and_fallback():
    """token_pack runs K items per attention call behind a block-diagonal
    mask — exactly equal to the unpacked tower; non-divisible batches fall
    back to unpacked. (TPU perf feature: see docs/performance.md round-3.)"""
    cfg = small_cfg()
    tower = build_image_head(cfg.model.image)
    cfg_p = small_cfg()
    cfg_p.model.image["token_pack"] = 4
    packed = build_image_head(cfg_p.model.image)
    assert packed.token_pack == 4
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 3, 224, 224)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), x)
    y0 = tower.apply(params, x)
    y1 = packed.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-5, atol=2e-6)
    # B=6 not divisible by 4 -> unpacked path, still exact
    y2 = packed.apply(params, x[:6])
    np.testing.assert_allclose(np.asarray(y0[:6]), np.asarray(y2), rtol=2e-5, atol=2e-6)


def test_text_token_pack_exact():
    """Packed captions behind a per-segment causal mask == unpacked text
    tower (block-diagonal + causal composition)."""
    cfg = small_cfg()
    tower = build_text_head(cfg.model.text)
    cfg_p = small_cfg()
    cfg_p.model.text["token_pack"] = 4
    packed = build_text_head(cfg_p.model.text)
    ids = np.zeros((8, 77), np.int64)
    rng = np.random.default_rng(0)
    for i in range(8):
        n = int(rng.integers(3, 20))
        ids[i, :n] = rng.integers(1, 400, n)
        ids[i, n] = 49407  # EOT
    ids = jnp.asarray(ids)
    params = tower.init(jax.random.PRNGKey(0), ids)
    y0 = tower.apply(params, ids)
    y1 = packed.apply(params, ids)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-5, atol=2e-6)
