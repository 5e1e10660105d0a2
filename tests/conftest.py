"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env before the first ``import jax`` anywhere in the test session.
"""

import os

# Force CPU for tests even when the shell points at a TPU (JAX_PLATFORMS=axon):
# tests need determinism, fp32 exactness, and the virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin can override JAX_PLATFORMS; pin via config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
