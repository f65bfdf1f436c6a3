"""RN-style visual tower port parity vs the clean-room torch oracle."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vipant_tpu.ckpt.clip_port import port_clip_visual  # noqa: E402
from vipant_tpu.nn import VisionTower  # noqa: E402

from torch_oracle_resnet import OracleModifiedResNet  # noqa: E402


def test_resnet_tower_parity():
    torch.manual_seed(0)
    oracle = OracleModifiedResNet(layers=(1, 1, 1, 1), width=16, embed_dim=32).eval()
    # randomize BN running stats so the port is actually exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.3)

    sd = oracle.state_dict()
    tower = VisionTower(
        width=16, embed_dim=32, resolution=224, heads=8, layers=(1, 1, 1, 1),
        backbone="resnet",
    )
    variables = port_clip_visual(sd, tower)
    assert "batch_stats" in variables

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    ours = np.asarray(tower.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    cos = np.sum(ours * ref, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 1 - 1e-5, (cos, np.abs(ours - ref).max())
