"""Test configuration: CPU backend with 8 virtual devices (so mesh/sharding
tests run without a TPU pod — SURVEY.md section 4 test-strategy note), and
float64 enabled so numerical oracles are meaningful.

Must set env vars before jax initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# installed; the config update below is what actually selects CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
