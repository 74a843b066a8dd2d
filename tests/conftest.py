"""Test configuration: CPU JAX with 8 virtual devices.

Tests must run without a TPU (reference CI runs with mock embeddings and no
model files, reference: .github/workflows/rust.yml:19-22). The env vars must
be set before jax initializes its backends, hence this conftest-level setup.
"""

import os

# Force-override: the environment pre-sets JAX_PLATFORMS (e.g. to a TPU
# tunnel) and its sitecustomize may have already written jax_platforms via
# jax.config, which beats the env var. Override both, before any backend
# initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
