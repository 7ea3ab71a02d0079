"""Parameter/batch placement rules over the ('data', 'model') mesh.

The reference has no distributed code at all (SURVEY.md §2.9); this module
IS the communication layer, expressed declaratively: shardings are attached
to arrays, XLA inserts the ICI collectives.

Tensor-parallel rule (Megatron-style column/row split, applied when the dim
divides by the 'model' axis size):
* FFN up-projections (fc1 / ff1 / w_in / pw_exp) -> shard OUTPUT features
  (column-parallel);
* FFN down-projections (fc2 / ff2 / w_out / proj / pw_proj) -> shard INPUT
  features (row-parallel; XLA all-reduces the partial sums);
* attention q/k/v projections -> column-parallel over heads;
* the vocab classifier (classifier_2) -> column-parallel over classes;
* embeddings -> sharded over the vocab axis.
Everything else (norms, biases, convs' spatial kernels) replicates.

FSDP rule (ZeRO-style, ``--fsdp``): every parameter leaf with at least
``FSDP_MIN_SIZE`` elements additionally shards its largest still-free dim
over the 'data' axis — and because ``place_state`` mirrors the Adam
moments onto their params' layouts, the optimizer state (2x param bytes)
shards with them. GSPMD picks the per-layer resharding (weight all-gather
at use, or — when activations are smaller than the weight, as in the tiny
audit model — channel-parallel compute with activation reshards); either
way per-device state memory drops ~1/dp and the math matches pure DP
exactly (tests/test_fsdp.py + the dryrun artifact; the communication
budget AND the absence of GSPMD involuntary-remat fallbacks are pinned by
tests/test_sharding_audit.py). Leaves below the threshold stay
replicated — gathering a tiny bias costs a latency-bound collective and
saves nothing. Embedding tables shard on their ROW dim only (see the
inline comment in ``infer_param_shardings``).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mmvqa_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS, MeshSpec

# Smallest leaf (elements) worth FSDP-sharding: below this the per-use
# all-gather is latency-bound and the memory saved is noise. Tests lower
# it so tiny fixture models exercise the path.
FSDP_MIN_SIZE = 2 ** 15

COLUMN_PARALLEL = (
    "fc1", "ff1", "w_in", "pw_exp", "proj_q", "proj_k", "proj_v", "kqv",
    "to_q", "shared_kv", "classifier_2", "head_2",
)
ROW_PARALLEL = ("fc2", "ff2", "w_out", "proj", "pw_proj", "to_out")
VOCAB_PARALLEL = ("word_embeddings",)


def _spec_for(path: tuple, leaf: Any, tp: int) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    shape = np.shape(leaf)
    if len(shape) < 2 or tp <= 1:
        return P()
    is_kernel = names[-1] in ("kernel", "embedding")
    if not is_kernel:
        return P()
    module = names[-2] if len(names) >= 2 else ""
    base = module.rsplit("_", 1)[0] if module.rsplit("_", 1)[-1].isdigit() else module

    def col():
        if shape[-1] % tp == 0:
            return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
        return P()

    def row():
        if shape[-2] % tp == 0:
            return P(*([None] * (len(shape) - 2)), MODEL_AXIS, None)
        return P()

    if names[-1] == "embedding" and any(v in names for v in VOCAB_PARALLEL):
        if shape[0] % tp == 0:
            return P(MODEL_AXIS)
        return P()
    if base in COLUMN_PARALLEL or module in COLUMN_PARALLEL:
        return col()
    if base in ROW_PARALLEL or module in ROW_PARALLEL:
        return row()
    return P()


def _with_fsdp(spec: P, shape: tuple, dp: int, dims=None) -> P:
    """Add the 'data' axis to ``spec`` on the largest still-unsharded dim
    divisible by ``dp`` (ZeRO-style weight sharding). Composes with TP:
    a kernel already column-parallel over 'model' gets its OTHER dim
    sharded over 'data' (standard 2-D FSDP+TP layout). Leaves with no
    divisible free dim stay as-is (replicated over 'data') — graceful,
    never an error. ``dims`` restricts the candidate dims (conv kernels:
    out-channel only, see ``infer_param_shardings``)."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    candidates = range(len(shape)) if dims is None else dims
    free = [
        d for d in candidates
        if entries[d] is None and shape[d] % dp == 0
    ]
    if not free:
        return spec
    d = max(free, key=lambda i: shape[i])
    entries[d] = DATA_AXIS
    while entries and entries[-1] is None:  # canonical: no trailing Nones
        entries.pop()
    return P(*entries)


def infer_param_shardings(
    params: Any, mesh_spec: MeshSpec, fsdp: bool = False
) -> Any:
    """PyTree of NamedShardings mirroring ``params``."""
    tp = mesh_spec.model_size
    dp = mesh_spec.data_size
    mesh = mesh_spec.mesh

    pp = mesh_spec.pipe_size

    def one(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if pp > 1 and "pp_layers" in names and np.ndim(leaf) >= 1 \
                and np.shape(leaf)[0] % pp == 0:
            # Pipeline-stacked layer leaves (parallel/pipeline.py): leading
            # layer axis over 'pipe' — each stage holds its own layers and
            # the shard_map consumes them with zero resharding.
            return NamedSharding(mesh, P(PIPE_AXIS))
        spec = _spec_for(path, leaf, tp)
        if fsdp and dp > 1 and np.size(leaf) >= FSDP_MIN_SIZE \
                and np.ndim(leaf) >= 2:
            if names[-1] == "embedding":
                # Embedding tables FSDP-shard on the ROW (vocab/position)
                # dim ONLY: putting 'data' on the hidden dim makes every
                # lookup output hidden-sharded over 'data', which GSPMD
                # must transpose-reshard against the (data, context)
                # activation layout — on a 3-axis mesh it gives up and
                # fully rematerializes the tensor per step ("[SPMD]
                # Involuntary full rematerialization", measured round 5:
                # FSDP x TP x CP was the only composition that tripped it,
                # 3/3 fallbacks on this chain; tools/sharding_audit.py
                # captures the diagnostics, tests pin zero fallbacks).
                # When TP already owns the row dim, the table stays 1/tp
                # and skips FSDP — a 2x memory concession on ONE tensor
                # family, never a per-step remat.
                if tuple(spec) == () and np.shape(leaf)[0] % dp == 0:
                    spec = P(DATA_AXIS)
            elif names[-1] == "kernel" and np.ndim(leaf) >= 3 \
                    and len(names) >= 2 \
                    and str(names[-2]).startswith("token_conv"):
                # Token-head conv kernels (1, 1, K_in, hidden) FSDP-shard
                # the OUT-channel dim ONLY — the same fallback chain as
                # the embedding hidden dim, second site (measured round
                # 5, FSDP x TP x CP with the flagship RealFormer config):
                # these convs produce the visual tokens that join the
                # (data, context)-constrained fused sequence, and 'data'
                # on their IN-channel dim (the largest free dim) makes
                # GSPMD full-remat the gathered weight against that
                # layout ("[SPMD] Involuntary full rematerialization" on
                # token_conv_2/conv_general_dilated). Out-channel
                # sharding is column-parallel-shaped, which GSPMD
                # reshards legally. Trunk conv kernels (whose activations
                # never touch 'context') keep the largest-free-dim rule —
                # measured clean on every audited composition, and e.g.
                # SE-reduce kernels (1, 1, C, C/r) can ONLY shard their
                # in-channel dim at dp=8.
                spec = _with_fsdp(
                    spec, np.shape(leaf), dp, dims=(np.ndim(leaf) - 1,)
                )
            else:
                spec = _with_fsdp(spec, np.shape(leaf), dp)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def place_state(state, mesh_spec: MeshSpec, fsdp: bool = False):
    """Place a TrainState: params per TP rule (+ ZeRO-style 'data'-axis
    sharding when ``fsdp``), optimizer moments mirroring their params'
    layout, everything else replicated.

    Adam's ``mu``/``nu`` trees are structural copies of ``params`` (optax
    builds them with tree_map), so any opt_state subtree whose treedef
    equals the params treedef gets the per-leaf param shardings. This keeps
    TP/FSDP memory scaling for the optimizer (2x param bytes) and avoids
    per-step resharding of moments against sharded params.
    """
    p_sh = infer_param_shardings(state.params, mesh_spec, fsdp=fsdp)
    rep = mesh_spec.replicated()
    p_struct = jax.tree_util.tree_structure(state.params)

    def params_like(x):
        return jax.tree_util.tree_structure(x) == p_struct

    params = jax.tree.map(
        lambda x, s: jax.device_put(x, s), state.params, p_sh
    )

    opt_leaves, opt_def = jax.tree_util.tree_flatten(
        state.opt_state, is_leaf=params_like
    )
    placed = [
        jax.tree.map(lambda x, s: jax.device_put(x, s), leaf, p_sh)
        if params_like(leaf)
        else jax.device_put(leaf, rep)
        for leaf in opt_leaves
    ]
    opt_state = jax.tree_util.tree_unflatten(opt_def, placed)
    batch_stats = jax.tree.map(
        lambda x: jax.device_put(x, rep), state.batch_stats
    )
    return state.replace(
        params=params, opt_state=opt_state, batch_stats=batch_stats
    )


def constrain_batch_seq(x: jax.Array) -> jax.Array:
    """Pin a (B, T, ...) activation to the canonical (data, context)
    layout via ``with_sharding_constraint`` — no-op when no mesh is active.

    This is BOTH the idiomatic GSPMD hint and a live miscompile guard:
    jax 0.9.0's SPMD partitioner computes WRONG VALUES (not float noise —
    0.2-5.0 absolute error) for the pattern
    ``take(table P('model'), ids P('data','context'))`` feeding a
    row-parallel matmul under ``value_and_grad`` on a 3-axis mesh
    (12-line repro pinned in tests/test_sharding_guard.py; found round 4
    when the dryrun's sharded-vs-unsharded loss check tripped).
    Constraining the lookup output to the activation layout cuts the bad
    propagation and restores exact equality.
    """
    from mmvqa_tpu.core import mesh as mesh_module

    spec = mesh_module.CURRENT
    if spec is None or spec.mesh.size == 1 or x.ndim < 2:
        return x
    p = P("data", "context", *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(spec.mesh, p)
    )


# Sequence-shaped batch fields (B, T): with context parallelism (cp>1) the
# token axis is sharded over 'context' and GSPMD inserts the attention
# gathers (SURVEY.md §5.7). Everything else shards the batch dim only.
SEQUENCE_KEYS = frozenset(
    ("tokens", "aug_tokens", "segment_ids", "input_mask", "labels",
     "aug_labels")
)


def place_batch(batch: dict, mesh_spec: MeshSpec, stacked: bool = False) -> dict:
    """Shard array fields on the batch dim over 'data' (and the token axis
    over 'context' when the mesh has cp>1). ``stacked=True`` for
    (steps, batch, ...) super-step inputs — the batch dim is axis 1."""
    from jax.sharding import PartitionSpec as P

    lead = (None, "data") if stacked else ("data",)
    sh = NamedSharding(mesh_spec.mesh, P(*lead))
    seq_sh = (
        NamedSharding(mesh_spec.mesh, P(*lead, "context"))
        if mesh_spec.context_size > 1
        else sh
    )
    out = {}
    for k, v in batch.items():
        if isinstance(v, (list, str)):
            out[k] = v
        else:
            out[k] = jax.device_put(
                np.asarray(v), seq_sh if k in SEQUENCE_KEYS else sh
            )
    return out
