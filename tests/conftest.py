"""Test bootstrap: force an 8-device virtual CPU mesh before jax is imported.

This is the JAX-native analogue of a fake multi-device backend (the reference
had none; SURVEY.md §4): all sharding/collective tests run against
``xla_force_host_platform_device_count=8``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env may point at a TPU

# A sitecustomize may pre-import jax at interpreter startup, freezing the
# jax_platforms config default before the env var above takes effect; the
# explicit config update wins as long as no backend has initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
