"""Regressions for the round-4 advisor findings: legacy qkv checkpoint
layout shim, seq-parallel silent-fallback warning, eval-all budget knob,
training-path-only malloc tuning."""

import os

import numpy as np
import pytest


def test_legacy_flat_qkv_checkpoint_restores(tmp_path):
    """Checkpoints saved before the TP-shardable [C, 3, C] qkv layout
    (nn.layers._QKVParams) stored flat [C, 3C]/[3C] leaves; load_checkpoint
    must reshape them onto the modern template instead of failing the
    StandardCheckpointer shape match."""
    import jax
    import jax.numpy as jnp

    from vipant_tpu.ckpt.orbax_io import load_checkpoint, save_checkpoint

    d = 8
    rng = np.random.default_rng(0)
    modern = {
        "attn": {
            "qkv": {
                "kernel": jnp.asarray(rng.standard_normal((d, 3, d)), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal((3, d)), jnp.float32),
            },
            "out": {"kernel": jnp.asarray(rng.standard_normal((d, d)), jnp.float32)},
        },
        "step": jnp.asarray(7, jnp.int32),
    }
    legacy = jax.tree_util.tree_map(lambda x: x, modern)
    legacy["attn"]["qkv"]["kernel"] = modern["attn"]["qkv"]["kernel"].reshape(d, 3 * d)
    legacy["attn"]["qkv"]["bias"] = modern["attn"]["qkv"]["bias"].reshape(3 * d)
    path = save_checkpoint(str(tmp_path / "ck"), 1, legacy)
    restored = load_checkpoint(path, modern)
    assert restored["attn"]["qkv"]["kernel"].shape == (d, 3, d)
    assert restored["attn"]["qkv"]["bias"].shape == (3, d)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(modern)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_modern_qkv_checkpoint_still_restores(tmp_path):
    """The shim must not perturb the normal (modern-layout) restore path."""
    import jax.numpy as jnp

    from vipant_tpu.ckpt.orbax_io import load_checkpoint, save_checkpoint

    state = {"qkv": {"kernel": jnp.ones((4, 3, 4))}, "n": jnp.asarray(3)}
    path = save_checkpoint(str(tmp_path / "ck"), 2, state)
    restored = load_checkpoint(path, state)
    np.testing.assert_allclose(np.asarray(restored["qkv"]["kernel"]), 1.0)


def test_seq_disqualified_mask_warns():
    """A seq mesh axis > 1 with a boolean (disqualifying) mask must warn
    about the S-fold compute replication instead of silently running the
    unsharded path (round-4 advisor: the old trainer warning was removed)."""
    import jax
    import jax.numpy as jnp

    from vipant_tpu.nn.layers import StackedTransformer
    from vipant_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, model=1, seq=2, devices=jax.devices()[:2])
    model = StackedTransformer(layers=1, num_heads=2)
    x = jnp.zeros((2, 4, 8), jnp.float32)
    mask = jnp.ones((4, 4), bool)  # boolean mask: not ring-shardable
    params = model.init(jax.random.PRNGKey(0), x)
    with jax.sharding.set_mesh(mesh):
        with pytest.warns(UserWarning, match="seq-parallel trunk disqualified"):
            model.apply(params, x, mask)


def test_eval_all_cap_knob():
    """The evaluate-all-checkpoints pass budget: eval_all_samples wins when
    set (inf = uncapped), else falls back to eval_samples."""
    from vipant_tpu.config import Config
    from vipant_tpu.train.trainer import Trainer

    class Echo:
        def __init__(self):
            self.lines = []

        def info(self, m):
            self.lines.append(m)

    t = Trainer.__new__(Trainer)
    t.echo = Echo()
    t.cfg = Config({"running": {"eval_samples": 100}})
    assert t._eval_all_cap() == 100
    assert any("capped" in l for l in t.echo.lines)  # fallback is announced
    t.cfg = Config({"running": {"eval_samples": 100, "eval_all_samples": "inf"}})
    assert t._eval_all_cap() is None
    t.cfg = Config({"running": {"eval_samples": 100, "eval_all_samples": 25}})
    assert t._eval_all_cap() == 25


def test_malloc_tuning_only_for_training_loaders(monkeypatch):
    """Constructing an eval (non-shuffle) DataLoader must not mutate the
    process-global glibc malloc thresholds (round-4 advisor)."""
    import vipant_tpu.utils.hostmem as hostmem
    from vipant_tpu.data.loader import DataLoader

    calls = []
    monkeypatch.setattr(hostmem, "tune_host_allocator", lambda *a, **k: calls.append(1))
    monkeypatch.delenv("VIPANT_TUNE_MALLOC", raising=False)
    ds = list(range(8))
    DataLoader(ds, 4, collate_fn=list, shuffle=False)
    assert not calls, "eval loader must not touch the host allocator"
    DataLoader(ds, 4, collate_fn=list, shuffle=True)
    assert calls, "training loader should tune the host allocator"
    calls.clear()
    monkeypatch.setenv("VIPANT_TUNE_MALLOC", "0")
    DataLoader(ds, 4, collate_fn=list, shuffle=True)
    assert not calls, "VIPANT_TUNE_MALLOC=0 must win"
    monkeypatch.setenv("VIPANT_TUNE_MALLOC", "1")
    DataLoader(ds, 4, collate_fn=list, shuffle=False)
    assert calls, "VIPANT_TUNE_MALLOC=1 must win"
