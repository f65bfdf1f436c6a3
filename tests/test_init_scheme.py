"""CLIP from-scratch init scheme: depth-scaled stds on transformer kernels
(parity: `/root/reference/clip/model.py:330-350`)."""

import jax
import jax.numpy as jnp
import numpy as np

from vipant_tpu.nn.layers import Transformer


def _stds(layers, width=256, heads=4):
    t = Transformer(layers=layers, num_heads=heads)
    x = jnp.zeros((1, 8, width))
    params = t.init(jax.random.PRNGKey(0), x)["params"]
    blk = params["block_0"]
    return {
        "qkv": float(np.std(blk["attn"]["qkv"]["kernel"])),
        "out": float(np.std(blk["attn"]["out"]["kernel"])),
        "fc": float(np.std(blk["mlp"]["fc"]["kernel"])),
        "proj": float(np.std(blk["mlp"]["proj"]["kernel"])),
    }


def test_clip_init_stds():
    width, layers = 256, 4
    s = _stds(layers, width)
    assert abs(s["qkv"] - width ** -0.5) < 0.1 * width ** -0.5
    expect_out = (width ** -0.5) * ((2 * layers) ** -0.5)
    assert abs(s["out"] - expect_out) < 0.1 * expect_out
    expect_fc = (2 * width) ** -0.5
    assert abs(s["fc"] - expect_fc) < 0.1 * expect_fc
    assert abs(s["proj"] - expect_out) < 0.1 * expect_out


def test_init_depth_scaling():
    """Deeper stacks get smaller residual-projection init."""
    shallow = _stds(2)
    deep = _stds(8)
    assert deep["out"] < shallow["out"]
    assert abs(deep["out"] / shallow["out"] - 0.5) < 0.1  # sqrt(4/16)
