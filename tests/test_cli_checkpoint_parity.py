"""Checkpoint-parity dress rehearsal: a reference-format 4-tuple ``.pth``
(fabricated from the clean-room torch oracle) drives the FULL ESC-50
zero-shot flow through the ``train.py`` CLI (``eval=true``,
``model_file=*.pth``) — the BASELINE.md parity-gate plumbing, end to end
(parity: `/root/reference/cvap/model/helper.py:10-30` loading +
`/root/reference/cvap/monitor/esc50_clf.py` zero-shot)."""

import os
import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")

from data_synth import make_synth_esc50
from test_reference_port import _metahead_text_sd, _naive_audio_sd
from torch_oracle import TorchText, TorchVisual

from test_trainers import TINY_MODEL


def test_cli_esc50_zero_shot_from_reference_pth(tmp_path):
    make_synth_esc50(str(tmp_path), seconds=1.05)

    torch.manual_seed(0)
    visual = TorchVisual(width=64, layers=2, heads=4, embed_dim=32).eval()
    text = TorchText(width=32, layers=2, heads=4, embed_dim=32).eval()
    ckpt = {
        "cfg": {"note": "synthetic parity rehearsal"},
        # 4-tuple (image, audio, text, loss) with an absent image tower —
        # the reference's trimodal export shape
        "model": (
            None,
            _naive_audio_sd(visual),
            _metahead_text_sd(text),
            {"logit_scale": torch.tensor(1.0)},
        ),
    }
    run_dir = tmp_path / "run" / "test"
    os.makedirs(run_dir, exist_ok=True)
    torch.save(ckpt, str(run_dir / "00000042.pth"))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = os.getcwd()
    env["JAX_PLATFORMS"] = "cpu"
    args = [
        sys.executable,
        "train.py",
        "+running=esc50",
        *[o for o in TINY_MODEL if o != "verbose=False"],
        "+model/loss=ce_cls",
        "worker=ESClassifier",
        "monitor=ESCMonitor",
        f"running.data_root={tmp_path}",
        "running.data_name=esc50",
        "running.zero_shot=True",
        "running.batch_size=4",
        "running.epochs=1",
        "verbose=True",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=00000042.pth",
        "eval=True",
    ]
    res = subprocess.run(
        args, env=env, cwd=os.getcwd(), capture_output=True, text=True, timeout=540
    )
    out = res.stdout + res.stderr
    assert res.returncode == 0, out[-3000:]
    assert "A->T: p1 =" in out, out[-3000:]
    # the ported checkpoint must actually have been consumed
    assert "00000042.pth" in out or "reference checkpoint" in out, out[-3000:]
