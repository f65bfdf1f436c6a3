import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipant_tpu.ops.patches import extract_patches


def _conv_ref(x, kernel, stride):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=stride, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "hw,patch,stride,c",
    [
        ((224, 224), (32, 32), (32, 32), 3),  # image: non-overlapping
        ((1000, 128), (32, 32), (16, 24), 1),  # audio: overlapping rect
        ((100, 128), (32, 32), (16, 16), 1),
    ],
)
def test_patches_match_conv(rng, hw, patch, stride, c):
    x = jnp.asarray(rng.standard_normal((2, *hw, c)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((*patch, c, 8)), jnp.float32)
    ref = _conv_ref(x, kernel, stride)
    B, gh, gw, D = ref.shape
    patches = extract_patches(x, patch, stride)
    assert patches.shape == (2, gh * gw, patch[0] * patch[1] * c)
    out = patches @ kernel.reshape(-1, 8)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref.reshape(B, gh * gw, D)))) < 5e-4
