"""GPipe-style pipeline parallelism for the BertEncoder and RealFormer.

No reference equivalent (SURVEY.md §2.9: the reference is single-device);
this is the TPU-native scale-out path for deep encoder stacks: the layer
stack is STACKED along a leading layer axis, sharded over the mesh's
'pipe' axis, and executed as a microbatch pipeline inside ``shard_map`` —
each stage holds ``n_layers/pp`` layers, activations hop stage-to-stage
over ICI via ``lax.ppermute``, and the classic GPipe bubble costs
``(pp-1)/(M+pp-1)`` of the ticks for ``M`` microbatches.

Math parity: one pipeline stage applies its local layers with EXACTLY the
same one-layer module the sequential ``models/transformer.py::BertEncoder``
loops over (including the shared-LayerNorm reference quirk — norm1/norm2
are single modules replicated to every stage), and the encoder has no
cross-batch coupling (attention/FFN/LayerNorm are per-sample), so
microbatching is exact, not an approximation. Pinned sequential==pipelined
(fwd + grads) in tests/test_pipeline_parallel.py.

Composition rules: pp composes with DP (each data shard runs its own
lock-step pipeline; shard_map's transpose psums the stacked-layer grads
over 'data'); tp_size and cp_size must be 1 (Config.validate enforces).

Two encoders pipeline: the vanilla ``BertEncoder``
(:class:`PipelinedBertEncoder`) and the flagship RealFormer
(:class:`PipelinedRealFormerEncoder`). The RealFormer's residual score
carry (reference models/realformer.py:30-45: each block hands its raw
post-mask score tensor (B, T, T, 8) to the next block) flows strictly
layer-to-layer, so it hops stages ALONGSIDE the activations — the
ppermute payload grows by one attention-score map per microbatch
(mb*T*T*8 floats ≈ 2.7x the hidden payload at T=75/H=768; well under an
ICI hop). The first global layer's ``prev=None`` becomes an explicit
zeros tensor so the tick payload is type-uniform — ``scores + 0`` is
bit-identical to the no-add path. The feedback-transformer stays
excluded: its rolling memory FIFO is consumed by EVERY later token
window (cross-layer AND cross-position state), which breaks GPipe's
stage-local dataflow.

Dropout deviation (documented, same class as ring attention): with
dropout active the pipelined path folds (data-shard, tick, local layer)
into the rng — the data-axis fold keeps each data shard's masks
independent, since the key enters shard_map replicated — so masks differ
from the sequential path's stream. Parity tests run deterministically;
training correctness is unaffected (independent Bernoulli draws either
way).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax
from jax.sharding import PartitionSpec as P

from mmvqa_tpu.core.mesh import DATA_AXIS, PIPE_AXIS

# Flax param-tree key for the stacked layer weights. parallel/sharding.py
# keys its P('pipe', ...) placement rule on this name.
STACKED_KEY = "pp_layers"


def _one_layer_encoder(hidden_size: int, n_heads: int, dropout_rate: float,
                       norm_pos: str, dtype) -> "nn.Module":
    """A single-layer BertEncoder: the exact per-layer math of
    models/transformer.py::BertEncoder (reference transformer.py:50-98),
    reused so pipelined and sequential paths share one implementation."""
    from mmvqa_tpu.models.transformer import BertEncoder

    return BertEncoder(
        hidden_size=hidden_size, n_layers=1, n_heads=n_heads,
        dropout_rate=dropout_rate, share="none", norm_pos=norm_pos,
        dtype=dtype,
    )


def _layer_vars(stacked: Dict[str, Any], i, norm1, norm2) -> Dict[str, Any]:
    """Assemble layer ``i``'s one-layer-BertEncoder param dict from the
    stacked tree (leading layer axis) plus the shared norms. ``norm2`` is
    None in 'pre' mode — the reference never uses it there
    (transformer.py:76-86), so flax creates no params for it."""
    sl = jax.tree.map(lambda x: x[i], stacked)
    out = {
        "attention_0": sl["attention_0"],
        "proj_0": sl["proj_0"],
        "feedforward_0": sl["feedforward_0"],
        "norm1": norm1,
    }
    if norm2 is not None:
        out["norm2"] = norm2
    return out


def stack_bert_encoder_params(params: Dict[str, Any], n_layers: int):
    """BertEncoder(share='none') param dict -> (stacked, norm1, norm2).

    ``stacked`` holds every per-layer leaf with a new leading layer axis
    (layer order preserved); the shared norms come out separately. Use to
    transfer a sequential checkpoint into the pipelined layout.
    """
    per_layer = [
        {
            "attention_0": params[f"attention_{i}"],
            "proj_0": params[f"proj_{i}"],
            "feedforward_0": params[f"feedforward_{i}"],
        }
        for i in range(n_layers)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)
    # 'pre' mode never uses norm2 (reference quirk) -> no params exist
    return stacked, params["norm1"], params.get("norm2")


def unstack_bert_encoder_params(stacked, norm1, norm2) -> Dict[str, Any]:
    """Inverse of :func:`stack_bert_encoder_params` (checkpoint export)."""
    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    out: Dict[str, Any] = {"norm1": norm1}
    if norm2 is not None:
        out["norm2"] = norm2
    for i in range(n_layers):
        sl = jax.tree.map(lambda x: x[i], stacked)
        out[f"attention_{i}"] = sl["attention_0"]
        out[f"proj_{i}"] = sl["proj_0"]
        out[f"feedforward_{i}"] = sl["feedforward_0"]
    return out


def _pick_microbatches(requested: int, batch_local: int, pp: int) -> int:
    """Resolve the microbatch count M: explicit value, else the largest of
    (2*pp, pp) dividing the per-data-shard batch. M=2*pp halves the GPipe
    bubble vs M=pp at no memory cost at these activation sizes."""
    if requested > 0:
        if batch_local % requested != 0:
            raise ValueError(
                f"pp_microbatches={requested} does not divide the "
                f"per-data-shard batch {batch_local}"
            )
        return requested
    for m in (2 * pp, pp):
        if batch_local % m == 0 and batch_local >= m:
            return m
    raise ValueError(
        f"per-data-shard batch {batch_local} not divisible into >= pp="
        f"{pp} microbatches; pick batch_size/pp_microbatches accordingly"
    )


class PipelinedBertEncoder(nn.Module):
    """Drop-in BertEncoder with a layer-stacked parameter layout.

    With a live multi-device mesh whose 'pipe' axis is >1
    (``core.mesh.CURRENT``, installed by ``cli.common.setup_runtime``), the
    forward runs the GPipe schedule in shard_map; otherwise it applies the
    layers sequentially (identical math — the single-chip / test baseline).

    Param tree: ``pp_layers`` (stacked per-layer attention/proj/FFN leaves,
    leading layer axis, P('pipe') sharded by parallel/sharding.py) plus the
    reference-quirk shared ``norm1``/``norm2`` (replicated).
    """

    hidden_size: int
    n_layers: int
    n_heads: int
    dropout_rate: float
    norm_pos: str = "pre"
    n_microbatches: int = 0  # 0 = auto (2*pp if it divides, else pp)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        H, L = self.hidden_size, self.n_layers

        def init_stacked(key):
            def dense(k, din, dout):
                return {
                    "kernel": nn.initializers.lecun_normal()(
                        k, (din, dout), jnp.float32
                    ),
                    "bias": jnp.zeros((dout,), jnp.float32),
                }

            def one(k):
                ks = jax.random.split(k, 6)
                return {
                    "attention_0": {
                        "proj_q": dense(ks[0], H, H),
                        "proj_k": dense(ks[1], H, H),
                        "proj_v": dense(ks[2], H, H),
                    },
                    "proj_0": dense(ks[3], H, H),
                    "feedforward_0": {
                        "fc1": dense(ks[4], H, 4 * H),
                        "fc2": dense(ks[5], 4 * H, H),
                    },
                }

            return jax.vmap(one)(jax.random.split(key, L))

        stacked = self.param(STACKED_KEY, init_stacked)
        # Shared-by-every-layer norms (reference quirk, transformer.py:76-86),
        # declared with nn.LayerNorm's exact tree layout ({'scale','bias'})
        # so sequential checkpoints transfer leaf-for-leaf. 'pre' mode never
        # uses norm2 — match BertEncoder and declare no params for it.
        norm_init = lambda _k: {
            "scale": jnp.ones((H,), jnp.float32),
            "bias": jnp.zeros((H,), jnp.float32),
        }
        n1 = self.param("norm1", norm_init)
        n2 = self.param("norm2", norm_init) if self.norm_pos == "post" else None

        layer = _one_layer_encoder(
            H, self.n_heads, self.dropout_rate, self.norm_pos, self.dtype
        )
        # The inner modules call make_rng('dropout') whenever
        # deterministic=False — even at rate 0 — so the rng must be
        # threaded on the deterministic flag alone, not the rate.
        use_rng = not deterministic
        base_key = self.make_rng("dropout") if use_rng else None

        def apply_layer(lvars, x, m, key):
            rngs = {"dropout": key} if use_rng else None
            return layer.apply(
                {"params": lvars}, x, m, deterministic, rngs=rngs
            )

        from mmvqa_tpu.core import mesh as mesh_module

        spec = mesh_module.CURRENT
        pp = spec.pipe_size if spec is not None else 1

        if pp <= 1:
            # Sequential fallback == models/transformer.py::BertEncoder
            for i in range(L):
                key = (
                    jax.random.fold_in(base_key, i) if use_rng else None
                )
                h = apply_layer(_layer_vars(stacked, i, n1, n2), h, mask, key)
            return h

        if L % pp != 0:
            raise ValueError(f"n_layers {L} not divisible by pp={pp}")
        dp = spec.data_size
        B = h.shape[0]
        if B % dp != 0:
            raise ValueError(f"batch {B} not divisible by dp={dp}")
        M = _pick_microbatches(self.n_microbatches, B // dp, pp)
        local_L = L // pp
        if mask is None:
            mask = jnp.ones(h.shape[:2], jnp.float32)
        dummy_key = base_key if use_rng else jax.random.PRNGKey(0)

        def gpipe(stacked_local, n1_, n2_, h_, m_, key_):
            s = lax.axis_index(PIPE_AXIS)
            if use_rng:
                # The key enters shard_map replicated (P()); without this
                # fold every data shard would draw IDENTICAL dropout masks
                # for different samples (unlike the pp=1/GSPMD path where
                # the global-batch mask is per-sample independent).
                key_ = jax.random.fold_in(key_, lax.axis_index(DATA_AXIS))
            b_local, T = h_.shape[0], h_.shape[1]
            mb = b_local // M
            h_mb = h_.reshape(M, mb, T, H)
            m_mb = m_.reshape(M, mb, T)

            def stage(x, m, key):
                for i in range(local_L):
                    k = jax.random.fold_in(key, i) if use_rng else None
                    x = apply_layer(
                        _layer_vars(stacked_local, i, n1_, n2_), x, m, k
                    )
                return x

            zero = jnp.zeros((mb, T, H), h_.dtype)
            out0 = jnp.zeros((M, mb, T, H), h_.dtype)

            def tick(carry, t):
                cur, out = carry
                fresh = lax.dynamic_index_in_dim(
                    h_mb, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
                )
                inp = jnp.where(s == 0, fresh, cur)
                mb_i = jnp.clip(t - s, 0, M - 1)
                m = lax.dynamic_index_in_dim(m_mb, mb_i, 0, keepdims=False)
                key = (
                    jax.random.fold_in(jax.random.fold_in(key_, t), s)
                    if use_rng else key_
                )
                y = stage(inp, m, key)
                out_i = jnp.clip(t - (pp - 1), 0, M - 1)
                valid = jnp.logical_and(s == pp - 1, t >= pp - 1)
                prev = lax.dynamic_index_in_dim(out, out_i, 0, keepdims=False)
                out = lax.dynamic_update_index_in_dim(
                    out, jnp.where(valid, y, prev), out_i, 0
                )
                nxt = lax.ppermute(
                    y, PIPE_AXIS, [(i, (i + 1) % pp) for i in range(pp)]
                )
                return (nxt, out), None

            (_, out), _ = lax.scan(
                tick, (zero, out0), jnp.arange(M + pp - 1)
            )
            # Only the last stage holds real outputs; psum replicates them
            # across the pipe axis (every other stage contributes zeros).
            out = lax.psum(
                jnp.where(s == pp - 1, out, jnp.zeros_like(out)), PIPE_AXIS
            )
            return out.reshape(b_local, T, H)

        return jax.shard_map(
            gpipe,
            mesh=spec.mesh,
            in_specs=(
                P(PIPE_AXIS),          # stacked layers: leading layer axis
                P(), P(),              # shared norms: replicated
                P(DATA_AXIS),          # activations: batch over data
                P(DATA_AXIS),          # mask
                P(),                   # rng key
            ),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )(stacked, n1, n2, h, mask, dummy_key)


def stack_realformer_params(params: Dict[str, Any], n_layers: int):
    """RealFormerEncoder param dict (``block_0..block_{L-1}``) -> stacked
    tree with a leading layer axis (layer order preserved). Inverse:
    :func:`unstack_realformer_params`. Use to transfer a sequential
    checkpoint into the pipelined layout (``train.checkpoint`` calls this
    automatically on layout mismatch)."""
    per_layer = [params[f"block_{i}"] for i in range(n_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)


def unstack_realformer_params(stacked) -> Dict[str, Any]:
    """Inverse of :func:`stack_realformer_params` (checkpoint export)."""
    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    return {
        f"block_{i}": jax.tree.map(lambda x: x[i], stacked)
        for i in range(n_layers)
    }


class PipelinedRealFormerEncoder(nn.Module):
    """Drop-in RealFormerEncoder with a layer-stacked parameter layout.

    Same GPipe schedule as :class:`PipelinedBertEncoder`, except the
    stage-to-stage payload is the PAIR (hidden states, residual attention
    scores): the reference RealFormer threads the raw post-mask score
    tensor block-to-block (models/realformer.py:30-45, mmbert.py:105-107),
    and that carry flows strictly layer-to-layer, so it rides the same
    ppermute hop as the activations. The first global layer receives an
    explicit zeros score tensor (``scores + 0`` == the reference's
    ``prev=None`` no-add, bit-identical modulo -0.0 which softmax/add
    cannot observe).

    Param tree: ``pp_layers`` holds every per-block leaf (kqv, proj, ln1,
    ff1, ff2, ln2) with a leading layer axis, P('pipe')-sharded by
    parallel/sharding.py. Unlike the vanilla encoder there are no shared
    norms — each RealFormer block owns its LayerNorms.
    """

    hidden_size: int
    n_layers: int
    head_cnt: int = 8  # mmbert.py:100 hard-codes 8 regardless of --heads
    dp1: float = 0.1
    dp2: float = 0.1
    n_microbatches: int = 0  # 0 = auto (2*pp if it divides, else pp)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        from mmvqa_tpu.models.realformer import ResEncoderBlock

        H, L, Hc = self.hidden_size, self.n_layers, self.head_cnt
        block = ResEncoderBlock(
            emb_s=H // Hc, head_cnt=Hc, dp1=self.dp1, dp2=self.dp2,
            dtype=self.dtype,
        )

        def init_stacked(key):
            # block.init under vmap: param shapes depend only on H/emb_s,
            # so a (1, 1, H) dummy gives the exact per-block tree layout
            # (kqv/proj/ln1/ff1/ff2/ln2) that stack_realformer_params
            # produces from a sequential checkpoint.
            dummy = jnp.zeros((1, 1, H), jnp.float32)

            def one(k):
                return block.init(k, dummy, None, None, True)["params"]

            return jax.vmap(one)(jax.random.split(key, L))

        stacked = self.param(STACKED_KEY, init_stacked)

        use_rng = not deterministic
        base_key = self.make_rng("dropout") if use_rng else None

        def apply_layer(lvars, x, prev, m, key):
            rngs = {"dropout": key} if use_rng else None
            return block.apply(
                {"params": lvars}, x, prev, m, deterministic, rngs=rngs
            )

        from mmvqa_tpu.core import mesh as mesh_module

        spec = mesh_module.CURRENT
        pp = spec.pipe_size if spec is not None else 1

        if pp <= 1:
            # Sequential fallback == models/realformer.py::RealFormerEncoder
            # (same one-block module, prev=None at the first layer)
            prev = None
            for i in range(L):
                key = jax.random.fold_in(base_key, i) if use_rng else None
                h, prev = apply_layer(
                    _layer_vars_rf(stacked, i), h, prev, mask, key
                )
            return h

        if L % pp != 0:
            raise ValueError(f"n_layers {L} not divisible by pp={pp}")
        dp = spec.data_size
        B = h.shape[0]
        if B % dp != 0:
            raise ValueError(f"batch {B} not divisible by dp={dp}")
        M = _pick_microbatches(self.n_microbatches, B // dp, pp)
        local_L = L // pp
        if mask is None:
            mask = jnp.ones(h.shape[:2], jnp.float32)
        dummy_key = base_key if use_rng else jax.random.PRNGKey(0)

        def gpipe(stacked_local, h_, m_, key_):
            s = lax.axis_index(PIPE_AXIS)
            if use_rng:
                # key enters shard_map replicated (P()); fold the data
                # shard in so dp shards draw independent dropout masks
                key_ = jax.random.fold_in(key_, lax.axis_index(DATA_AXIS))
            b_local, T = h_.shape[0], h_.shape[1]
            mb = b_local // M
            h_mb = h_.reshape(M, mb, T, H)
            m_mb = m_.reshape(M, mb, T)

            def stage(x, prev, m, key):
                for i in range(local_L):
                    k = jax.random.fold_in(key, i) if use_rng else None
                    x, prev = apply_layer(
                        _layer_vars_rf(stacked_local, i), x, prev, m, k
                    )
                return x, prev

            # scores layout (mb, T, T, Hc) per ops/attention.py:
            # einsum('bihe,bjhe->bijh')
            zero_x = jnp.zeros((mb, T, H), h_.dtype)
            zero_p = jnp.zeros((mb, T, T, Hc), self.dtype)
            out0 = jnp.zeros((M, mb, T, H), h_.dtype)

            def tick(carry, t):
                cur_x, cur_p, out = carry
                fresh = lax.dynamic_index_in_dim(
                    h_mb, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
                )
                inp_x = jnp.where(s == 0, fresh, cur_x)
                inp_p = jnp.where(s == 0, zero_p, cur_p)
                mb_i = jnp.clip(t - s, 0, M - 1)
                m = lax.dynamic_index_in_dim(m_mb, mb_i, 0, keepdims=False)
                key = (
                    jax.random.fold_in(jax.random.fold_in(key_, t), s)
                    if use_rng else key_
                )
                y, p = stage(inp_x, inp_p, m, key)
                out_i = jnp.clip(t - (pp - 1), 0, M - 1)
                valid = jnp.logical_and(s == pp - 1, t >= pp - 1)
                prev_out = lax.dynamic_index_in_dim(
                    out, out_i, 0, keepdims=False
                )
                out = lax.dynamic_update_index_in_dim(
                    out, jnp.where(valid, y, prev_out), out_i, 0
                )
                perm = [(i, (i + 1) % pp) for i in range(pp)]
                nxt_x = lax.ppermute(y, PIPE_AXIS, perm)
                nxt_p = lax.ppermute(
                    p.astype(self.dtype), PIPE_AXIS, perm
                )
                return (nxt_x, nxt_p, out), None

            (_, _, out), _ = lax.scan(
                tick, (zero_x, zero_p, out0), jnp.arange(M + pp - 1)
            )
            out = lax.psum(
                jnp.where(s == pp - 1, out, jnp.zeros_like(out)), PIPE_AXIS
            )
            return out.reshape(b_local, T, H)

        return jax.shard_map(
            gpipe,
            mesh=spec.mesh,
            in_specs=(
                P(PIPE_AXIS),          # stacked blocks: leading layer axis
                P(DATA_AXIS),          # activations: batch over data
                P(DATA_AXIS),          # query mask
                P(),                   # rng key
            ),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )(stacked, h, mask, dummy_key)


def _layer_vars_rf(stacked: Dict[str, Any], i) -> Dict[str, Any]:
    """Layer ``i``'s ResEncoderBlock param dict from the stacked tree."""
    return jax.tree.map(lambda x: x[i], stacked)
