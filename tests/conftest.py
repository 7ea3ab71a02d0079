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


@pytest.fixture(autouse=True)
def _isolate_process_globals():
    """Save/restore the runtime's process-global knobs around EVERY test.

    cli.common.setup_runtime installs mesh.CURRENT / attention.IMPL_DEFAULT
    / attention.RING_MESH for the drivers; tests that invoke driver mains
    (CLI wiring, runbook smokes) would otherwise leak them into unrelated
    tests — this class of leak broke a test once via attention globals
    (commit e19de52) and again when mesh.CURRENT started arming
    parallel.sharding.constrain_batch_seq (ADVICE r3 #3 asked for exactly
    this systematic guard)."""
    from mmvqa_tpu.core import mesh as mesh_module
    from mmvqa_tpu.ops import attention

    saved = (mesh_module.CURRENT, attention.IMPL_DEFAULT,
             attention.RING_MESH)
    try:
        yield
    finally:
        mesh_module.CURRENT = saved[0]
        attention.IMPL_DEFAULT = saved[1]
        attention.RING_MESH = saved[2]
