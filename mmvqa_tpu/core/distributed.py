"""Multi-host bootstrap (SURVEY.md §5.8 — no reference equivalent).

On a TPU pod slice, call ``maybe_initialize()`` before any jax use: each host
joins the jax.distributed cluster, the global mesh spans every chip, batches
shard per host through BatchLoader(shard_index=process_index,
shard_count=process_count), and epoch metrics cross the hosts with
``all_hosts_mean``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize when running multi-host (no-op otherwise).

    Resolution order: explicit args -> standard env (JAX auto-detects on
    Cloud TPU) -> single-process fallback.
    """
    import jax

    if coordinator_address or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") \
            or os.environ.get("TPU_WORKER_HOSTNAMES"):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError:
            pass  # already initialized


def process_shard() -> tuple:
    """(process_index, process_count) for per-host input sharding."""
    import jax

    return jax.process_index(), jax.process_count()


def all_hosts_mean(value: float) -> float:
    """Average a host-side scalar across processes (epoch metrics)."""
    import jax

    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(value))
    return float(np.mean(arr))
