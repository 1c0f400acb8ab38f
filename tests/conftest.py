"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
on a virtual CPU mesh instead (same XLA partitioner, same SPMD semantics).

Note: the axon sitecustomize registers the TPU tunnel backend at interpreter
startup and *forces* ``jax_platforms="axon,cpu"`` via jax.config — an env var
alone does not stick. We must both set XLA_FLAGS before the CPU client is
created and override the config value after jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.local_device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
