"""Device-mesh construction and sharding specs.

The reference is single-device (SURVEY.md §2.9: zero distributed code). Here
parallelism is a first-class subsystem: one ``jax.sharding.Mesh`` with
``('data', 'model')`` axes, batches sharded along ``data``, parameters
replicated (or tensor-sharded along ``model`` where the layer opts in), and
XLA emitting the gradient all-reduces over ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
CONTEXT_AXIS = "context"
PIPE_AXIS = "pipe"

# The process-wide active mesh, installed by cli.common.setup_runtime (or
# tests). Modules that can wrap a Pallas kernel in shard_map when a
# multi-device mesh is live (visual_tokens 'auto' routing) read it from
# here; None means "no mesh installed" (single-device or library use).
CURRENT: "Optional[MeshSpec]" = None


def set_current(spec: "Optional[MeshSpec]") -> None:
    global CURRENT
    CURRENT = spec


@dataclass(frozen=True)
class MeshSpec:
    mesh: Mesh

    @property
    def data_size(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def model_size(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    @property
    def context_size(self) -> int:
        return self.mesh.shape.get(CONTEXT_AXIS, 1)

    @property
    def pipe_size(self) -> int:
        return self.mesh.shape.get(PIPE_AXIS, 1)

    def batch_sharding(self) -> NamedSharding:
        """Batch tensors: sharded on the leading (batch) dim over 'data'."""
        return NamedSharding(self.mesh, P(DATA_AXIS))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def named(self, *axes: Optional[str]) -> NamedSharding:
        return NamedSharding(self.mesh, P(*axes))


def make_mesh(
    dp_size: int = -1,
    tp_size: int = 1,
    cp_size: int = 1,
    pp_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshSpec:
    """Build a ('data', 'model', 'context', 'pipe') mesh.

    ``dp_size=-1`` uses every device not claimed by tensor/context/pipeline
    parallelism. On a single chip this degenerates to a 1x1x1x1 mesh, so the
    same jit'd train step runs unchanged from one chip to a full slice.

    The 'context' axis is the sequence-parallel hook promised by SURVEY.md
    §5.7: at the reference's sequence lengths (75/28) it stays size 1 (a
    strict no-op); with cp_size>1 ``place_batch`` shards the token axis over
    it and GSPMD inserts the attention gathers. Ring/blockwise attention can
    later specialize the same axis without any API change.

    The 'pipe' axis is the pipeline-parallel axis (parallel/pipeline.py):
    with pp_size>1 the vanilla BertEncoder's layer stack shards over it and
    runs a GPipe microbatch schedule inside shard_map; at pp_size=1 it is a
    strict no-op for every existing sharding spec (unmentioned axes
    replicate).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp_size <= 0:
        tp_size = 1
    if cp_size <= 0:
        cp_size = 1
    if pp_size <= 0:
        pp_size = 1
    if dp_size == -1:
        if n % (tp_size * cp_size * pp_size) != 0:
            raise ValueError(
                f"{n} devices not divisible by tp_size*cp_size*pp_size="
                f"{tp_size * cp_size * pp_size}"
            )
        dp_size = n // (tp_size * cp_size * pp_size)
    if dp_size * tp_size * cp_size * pp_size != n:
        raise ValueError(
            f"dp_size*tp_size*cp_size*pp_size = "
            f"{dp_size * tp_size * cp_size * pp_size} != device count {n}"
        )
    arr = np.asarray(devices).reshape(dp_size, tp_size, cp_size, pp_size)
    return MeshSpec(
        mesh=Mesh(arr, (DATA_AXIS, MODEL_AXIS, CONTEXT_AXIS, PIPE_AXIS))
    )
