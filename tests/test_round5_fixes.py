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
    # weighted sampling is a TRAINING loader even though it passes
    # shuffle=False (audioset.py weighted paths) — it must tune too
    calls.clear()
    monkeypatch.delenv("VIPANT_TUNE_MALLOC", raising=False)
    DataLoader(ds, 4, collate_fn=list, shuffle=False, sample_weights=np.ones(8))
    assert calls, "weighted-sampling training loader must tune the allocator"


def test_legacy_lm_head_checkpoint_restores(tmp_path):
    """Checkpoints saved before LMLossHead grew its learnable logit_scale
    hold an empty lm_loss subtree; load_checkpoint must fill the scale (and
    its optimizer-moment mirrors) from the fresh state instead of failing
    the StandardCheckpointer structure match."""
    import jax.numpy as jnp

    from vipant_tpu.ckpt.orbax_io import load_checkpoint, save_checkpoint
    from vipant_tpu.nn.losses import LOGIT_SCALE_INIT

    old = {
        "params": {"dec": {"w": jnp.ones((2, 2))}, "lm_loss": {}},
        "mu": {"dec": {"w": jnp.full((2, 2), 0.25)}, "lm_loss": {}},
        "step": jnp.asarray(5),
    }
    path = save_checkpoint(str(tmp_path / "ck"), 5, old)
    fresh = {
        "params": {
            "dec": {"w": jnp.full((2, 2), 9.0)},
            "lm_loss": {"logit_scale": jnp.asarray(LOGIT_SCALE_INIT, jnp.float32)},
        },
        "mu": {
            "dec": {"w": jnp.full((2, 2), 9.0)},
            "lm_loss": {"logit_scale": jnp.zeros((), jnp.float32)},
        },
        "step": jnp.asarray(0),
    }
    restored = load_checkpoint(path, fresh)
    np.testing.assert_allclose(np.asarray(restored["params"]["dec"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(restored["mu"]["dec"]["w"]), 0.25)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["lm_loss"]["logit_scale"]), LOGIT_SCALE_INIT
    )
    np.testing.assert_allclose(np.asarray(restored["mu"]["lm_loss"]["logit_scale"]), 0.0)
    assert int(restored["step"]) == 5


def test_pak_audioset_filter_before_eval_cap(tmp_path):
    """The packed AudioSet eval loader must apply the ytid filter_set BEFORE
    the eval_samples cap (the src path filters at init and caps at
    iteration) — capping first evaluates a smaller, different subset."""
    from data_synth import make_synth_audioset
    from test_packed import _as_cfg
    from vipant_tpu.data import build_audioset_dataloader
    from vipant_tpu.data.audioset import build_audioset_label_map
    from vipant_tpu.data.packed import pack_audioset

    root = str(tmp_path)
    make_synth_audioset(root, "as_train", n=6, seconds=1.05)
    cfg = _as_cfg(root)
    label_map = build_audioset_label_map(cfg.running)
    pack_audioset(cfg.running, "as_train", label_map, pack_len=120)
    with open(os.path.join(root, "keep.csv"), "w") as f:
        f.write("y3\ny4\ny5\n")
    cfg = _as_cfg(root, [
        "running.filter_set=keep.csv",
        "running.eval_samples=2",
        "running.audio.transform_fbank=False",
    ])
    loader = build_audioset_dataloader(cfg, "pak_as_train", False)
    names = []
    for b in loader:
        c = int(b.get("_count", len(b["name"])))
        names += list(b["name"])[:c]
    # first eval_samples=2 of the FILTERED ids {y3,y4,y5}; pre-fix the cap
    # ran first (rows y0,y1) and the filter emptied the loader
    assert names == ["y3", "y4"]


def test_fused_mlp_applicable_inside_manual_mesh():
    """fused_mlp_applicable must not assume the model-axis split inside a
    shard_map body (manual mesh): _mesh_info runs the kernel full-width
    per device there, so the VMEM estimate must use the full hidden width
    (the caller's shapes are already local)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from vipant_tpu.ops.fused_mlp import fused_mlp_applicable
    from vipant_tpu.parallel import make_mesh
    from vipant_tpu.parallel.spmd import smap

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    # T=8, C=1024, expansion=8: the halved (E/2) estimate fits the VMEM
    # budget, the full-width one does not
    with jax.sharding.set_mesh(mesh):
        assert fused_mlp_applicable(8, 1024, 8, int8=True)
        seen = {}

        def body(x):
            seen["ok"] = fused_mlp_applicable(8, 1024, 8, int8=True)
            return x

        smap(body, mesh, in_specs=P("model"), out_specs=P("model"))(
            jnp.zeros((2,), jnp.float32)
        )
    assert seen["ok"] is False
