"""Round-trip of the reverse checkpoint bridge: our params → reference
``.pth`` (ckpt/reference_export.py) → back through our own reference porter
(ckpt/reference_port.py) must reproduce the original trees exactly — the
testable proxy for "the original codebase can consume our checkpoints"
(`/root/reference/cvap/model/helper.py:10-30`)."""

import os

import jax
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
from vipant_tpu.ckpt.reference_export import export_reference_pth  # noqa: E402
from vipant_tpu.nn import TextTower, VisionTower  # noqa: E402


def _towers():
    audio = VisionTower(
        resolution=(100, 128), patch_size=32, stride=(16, 24), width=64,
        layers=2, heads=4, embed_dim=32, in_channels=3,
    )
    text = TextTower(
        vocab_size=99, ctx_len=16, width=64, layers=2, heads=4, embed_dim=32
    )
    va = audio.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 100, 128), jnp.float32)
    )
    vt = text.init(jax.random.PRNGKey(1), jnp.zeros((1, 16), jnp.int32))
    return audio, text, va, vt


def _assert_trees_close(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_trees_close(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                rtol=1e-6, atol=1e-6, err_msg=f"{path}/{k}",
            )


def test_export_roundtrip_two_tuple(tmp_path):
    audio, _, va, _ = _towers()
    loss = {"logit_scale": np.float32(2.659)}
    path = str(tmp_path / "00000010.pth")
    export_reference_pth(path, {"audio": va["params"], "loss": loss})

    _, payload = load_torch_file(path)
    parts = split_reference_checkpoint(payload)
    back = port_reference_audio(parts["audio"], audio)
    _assert_trees_close(va["params"], back["params"])
    assert float(reference_loss_params(parts["loss"])["logit_scale"]) == pytest.approx(
        2.659
    )


@pytest.mark.slow  # compile-heavy; covered by faster siblings in the fast tier
def test_export_roundtrip_four_tuple_with_text(tmp_path):
    audio, text, va, vt = _towers()
    image_params = jax.tree_util.tree_map(lambda x: x, va["params"])  # same shape tower
    loss = {"logit_scale": np.float32(0.0)}
    path = str(tmp_path / "00000020.pth")
    export_reference_pth(
        path,
        {"image": image_params, "audio": va["params"], "text": vt["params"], "loss": loss},
    )

    _, payload = load_torch_file(path)
    parts = split_reference_checkpoint(payload)
    assert set(parts) == {"image", "audio", "text", "loss"}
    back_t = port_reference_text(parts["text"], text)
    _assert_trees_close(vt["params"], back_t["params"])


def test_trainer_export_pth_cli_flag(tmp_path):
    """A VA trainer save with export_pth=true must leave a loadable
    reference-format tuple checkpoint beside the Orbax state."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from data_synth import make_synth_va_index

    from vipant_tpu.config import compose
    from vipant_tpu.train import build_monitor

    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    make_synth_va_index(root, "train", n=8, seconds=1.05)
    cfg = compose([
        "+running=bimodal", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=dummy", "+model/loss=ce", "+optimizer=standard",
        "+running/audio=default", "worker=CVAP", "monitor=VAMonitor",
        "model.image.width=64", "model.image.embed_dim=32",
        "model.image.encoder.layers=2", "model.image.heads=4",
        "running.audio.max_len=100", "running.batch_size=8",
        f"running.data_root={root}", "running.data_name=train",
        "running.eval_name=", "running.epochs=0", "num_proc=1",
        "export_pth=true", "model_file=", "eval=False",
        f"alias_root={tmp_path}/run", f"model_root={tmp_path}/run",
    ])
    mon = build_monitor(cfg)
    mon.epoch(0)
    mon.save()
    import re

    step_dirs = [
        d
        for d in os.listdir(os.path.join(str(tmp_path), "run", str(cfg.model_name)))
        if re.fullmatch(r"\d{8}", d)
    ]
    assert step_dirs
    sdir = os.path.join(str(tmp_path), "run", str(cfg.model_name), sorted(step_dirs)[-1])
    pths = [f for f in os.listdir(sdir) if f.endswith(".pth")]
    assert pths, f"no .pth in {sdir}: {os.listdir(sdir)}"
    _, payload = load_torch_file(os.path.join(sdir, pths[0]))
    parts = split_reference_checkpoint(payload)
    assert "audio" in parts and "misc.positional_embedding" in parts["audio"]
