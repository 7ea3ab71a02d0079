"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device code paths (DP/TP sharding, all_gather SupCon) are exercised
without TPU hardware via XLA's host-platform device partitioning
(SURVEY.md §4 prescription (d)).
"""

import os

os.environ.pop("JAX_PLATFORMS", None)  # the env presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# config.update sticks even where the env var is overridden by the launcher
jax.config.update("jax_platforms", "cpu")

# Golden-value tests compare against float64/torch oracles; the 'default'
# matmul precision is allowed to drop to bf16 passes even on CPU.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
