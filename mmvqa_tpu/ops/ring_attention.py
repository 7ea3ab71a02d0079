"""Ring attention over the 'context' mesh axis (SURVEY.md §5.7).

The reference has no long-context mechanism (its sequences are 75/28
tokens); the TPU build carries a live ``context`` mesh axis whose default
implementation lets GSPMD insert the attention collectives — which, for
self-attention with sequence-sharded operands, means an all-gather of the
full K/V (and, for the RealFormer, the full (B, T, T, H) score tensor) on
every device. These functions are the O(T/cp) alternative: blockwise ring
attention in the scaling-book style — K/V blocks rotate around the
``context`` ring via ``lax.ppermute`` while each device owns one query
block and folds every visiting key block into an online softmax, so
per-device attention memory is (T/cp)·T probabilities at most and the K/V
collectives ride neighbor-to-neighbor ICI instead of an all-gather.

Numerics match the XLA paths in ``ops.attention`` (same -10000 finite
masking — no -inf edge cases in the running max, same f32 softmax / input-
dtype contraction, tolerance-level differences from the online
renormalization only). The vanilla flavor's backward is a flash-style
custom VJP by default: only the per-row softmax statistics (m, l) are
saved and each block's probabilities are rematerialized inside a second
ring pass whose dk/dv accumulators ride the rotation home with their
blocks (``vjp='autodiff'`` keeps the plain differentiated loop). The
RealFormer flavor stays on autodiff: its carried score tensor is itself
O((T/cp)·T) per device, so rematerialization cannot improve the
asymptotic.

Wiring: ``ops.attention`` dispatches here for ``impl='ring'`` with an
installed mesh (``mmvqa_tpu.ops.attention.RING_MESH``); the model code is
unchanged. Requires T % cp == 0.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from mmvqa_tpu.core.mesh import CONTEXT_AXIS, DATA_AXIS, MODEL_AXIS

NEG_BIG = 10000.0


def _ring_perm(cp: int):
    return [(i, (i + 1) % cp) for i in range(cp)]


def _device_rng(rng):
    """Fold every mesh coordinate into the key so no two shards reuse a
    dropout stream."""
    for ax in (DATA_AXIS, MODEL_AXIS, CONTEXT_AXIS):
        rng = jax.random.fold_in(rng, lax.axis_index(ax))
    return rng


def _vanilla_body(q, k, v, mask, rng, *, cp: int, dropout_rate: float,
                  deterministic: bool, with_stats: bool = False):
    """Per-shard body. q/k/v: (b, h, t_loc, d); mask: (b, t_loc).

    Online softmax over the cp key blocks; scores scaled in the input
    dtype then softmaxed in f32 and the probabilities cast back for the
    @v contraction — the same dtype discipline as
    ops.attention.vanilla_attention. ``with_stats`` additionally returns
    the per-row softmax statistics (m, l) for the flash-style backward.
    """
    D = q.shape[-1]
    scale = jnp.sqrt(jnp.asarray(D, jnp.float32)).astype(q.dtype)
    rng = _device_rng(rng)

    m = None
    l = None
    o = None
    k_cur, v_cur, mask_cur = k, v, mask
    for r in range(cp):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k_cur.astype(q.dtype)) / scale
        # mask arithmetic in the COMPUTE dtype, then f32 for softmax — the
        # exact dtype chain of ops.attention.vanilla_attention. In bf16 the
        # -10000 constant is 9984 and the subtraction quantizes the masked
        # scores; that rounding is part of the reference numerics.
        s = s - (NEG_BIG * (1.0 - mask_cur.astype(s.dtype)))[
            :, None, None, :]
        s = s.astype(jnp.float32)
        blk_max = jnp.max(s, axis=-1, keepdims=True)
        m_new = blk_max if m is None else jnp.maximum(m, blk_max)
        p = jnp.exp(s - m_new)
        p_v = p
        if not deterministic and dropout_rate > 0.0:
            # per-block fold: same rate as the unsharded path, different
            # stream (documented stochastic deviation — parity tests run
            # deterministic). Dropout hits only the numerator (@v) path:
            # the reference drops NORMALIZED probabilities, so the
            # normalizer l must keep accumulating the raw exps.
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, r), 1.0 - dropout_rate, p.shape)
            p_v = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        pv = jnp.einsum(
            "bhts,bhsd->bhtd", p_v.astype(q.dtype), v_cur
        ).astype(jnp.float32)
        if m is None:
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = pv
        else:
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            o = o * corr + pv
        m = m_new
        if r + 1 < cp:
            k_cur = lax.ppermute(k_cur, CONTEXT_AXIS, _ring_perm(cp))
            v_cur = lax.ppermute(v_cur, CONTEXT_AXIS, _ring_perm(cp))
            mask_cur = lax.ppermute(mask_cur, CONTEXT_AXIS, _ring_perm(cp))
    out = (o / l).astype(q.dtype)
    if with_stats:
        return out, m, l
    return out


def _vanilla_block_probs(q, k_cur, mask_cur, m, l, scale):
    """Recompute one key block's NORMALIZED probabilities from the saved
    softmax statistics (same dtype chain as the forward)."""
    s = jnp.einsum("bhtd,bhsd->bhts", q, k_cur.astype(q.dtype)) / scale
    s = s - (NEG_BIG * (1.0 - mask_cur.astype(s.dtype)))[:, None, None, :]
    s = s.astype(jnp.float32)
    return jnp.exp(s - m) / l


def _vanilla_bwd_body(q, k, v, mask, rng, out, m, l, g, *, cp: int,
                      dropout_rate: float, deterministic: bool):
    """Flash-style ring backward: recompute each visiting block's
    probabilities from (m, l) instead of saving them. The dk/dv
    accumulators ride the ring WITH their k/v blocks (cp rotations total =
    identity), so each block arrives home fully accumulated. Per-step
    memory is one (Tq, Tk) block — the asymptotic win over autodiff,
    which saves all cp blocks' probabilities.

    delta = sum(g*out) equals the full-row sum(p*dp) even under dropout:
    with P_drop = keep*p/(1-rate), sum_s p[s]*dp_norm[s] =
    sum_s P_drop[s]*dP_drop[s] = g.out."""
    D = q.shape[-1]
    scale = jnp.sqrt(jnp.asarray(D, jnp.float32)).astype(q.dtype)
    rng = _device_rng(rng)
    drop = not deterministic and dropout_rate > 0.0

    g32 = g.astype(jnp.float32)
    delta = jnp.sum(g32 * out.astype(jnp.float32), axis=-1, keepdims=True)
    dq = jnp.zeros(q.shape, jnp.float32)
    k_cur, v_cur, mask_cur = k, v, mask
    dk_cur = jnp.zeros(k.shape, jnp.float32)
    dv_cur = jnp.zeros(v.shape, jnp.float32)
    for r in range(cp):
        p = _vanilla_block_probs(q, k_cur, mask_cur, m, l, scale)
        dp = jnp.einsum("bhtd,bhsd->bhts", g32,
                        v_cur.astype(jnp.float32))
        if drop:
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, r), 1.0 - dropout_rate, p.shape)
            p_v = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
            dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
        else:
            p_v = p
        dv_cur = dv_cur + jnp.einsum("bhts,bhtd->bhsd", p_v, g32)
        ds = p * (dp - delta)
        dq = dq + jnp.einsum(
            "bhts,bhsd->bhtd", ds, k_cur.astype(jnp.float32)
        ) / scale.astype(jnp.float32)
        dk_cur = dk_cur + jnp.einsum(
            "bhts,bhtd->bhsd", ds, q.astype(jnp.float32)
        ) / scale.astype(jnp.float32)
        # rotate every iteration (cp total = identity): the accumulators
        # arrive home exactly when their k/v blocks do
        k_cur = lax.ppermute(k_cur, CONTEXT_AXIS, _ring_perm(cp))
        v_cur = lax.ppermute(v_cur, CONTEXT_AXIS, _ring_perm(cp))
        mask_cur = lax.ppermute(mask_cur, CONTEXT_AXIS, _ring_perm(cp))
        dk_cur = lax.ppermute(dk_cur, CONTEXT_AXIS, _ring_perm(cp))
        dv_cur = lax.ppermute(dv_cur, CONTEXT_AXIS, _ring_perm(cp))
    return (dq.astype(q.dtype), dk_cur.astype(k.dtype),
            dv_cur.astype(v.dtype))


@functools.lru_cache(maxsize=None)
def _flash_vanilla(cp: int, dropout_rate: float, deterministic: bool):
    """custom_vjp per-shard core (built per static config): forward saves
    only (q, k, v, mask, rng, out, m, l) — no probability blocks."""

    @jax.custom_vjp
    def core(q, k, v, mask, rng):
        return _vanilla_body(
            q, k, v, mask, rng, cp=cp, dropout_rate=dropout_rate,
            deterministic=deterministic,
        )

    def fwd(q, k, v, mask, rng):
        out, m, l = _vanilla_body(
            q, k, v, mask, rng, cp=cp, dropout_rate=dropout_rate,
            deterministic=deterministic, with_stats=True,
        )
        return out, (q, k, v, mask, rng, out, m, l)

    def bwd(res, g):
        q, k, v, mask, rng, out, m, l = res
        dq, dk, dv = _vanilla_bwd_body(
            q, k, v, mask, rng, out, m, l, g, cp=cp,
            dropout_rate=dropout_rate, deterministic=deterministic,
        )
        # integer-dtype primal (the rng key) takes a float0 cotangent
        return (dq, dk, dv, jnp.zeros_like(mask),
                np.zeros(rng.shape, jax.dtypes.float0))

    core.defvjp(fwd, bwd)
    return core


def ring_vanilla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array],
    mesh,
    *,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    vjp: str = "flash",
) -> jax.Array:
    """Sequence-parallel equivalent of ops.attention.vanilla_attention.

    q/k/v: (B, H, T, D); key_mask: (B, T) 1=real/0=pad. The wrapper shards
    B over 'data', H over 'model' and T over 'context'; GSPMD reshards the
    surrounding graph as needed. ``vjp='flash'`` (default) recomputes the
    probability blocks in the backward from saved softmax statistics —
    O(one block) of backward memory; ``'autodiff'`` differentiates the
    forward loop (saves every block's probabilities).
    """
    cp = mesh.shape[CONTEXT_AXIS]
    T = q.shape[2]
    if T % cp:
        raise ValueError(f"ring attention needs T({T}) % cp({cp}) == 0")
    if key_mask is None:
        key_mask = jnp.ones(q.shape[:1] + q.shape[2:3], jnp.float32)
    if dropout_rng is None:
        if not deterministic and dropout_rate > 0.0:
            # the XLA path fails loudly here (bernoulli on a None key);
            # silently defaulting would reuse one fixed mask every call
            raise ValueError(
                "ring attention: dropout_rng is required when "
                "deterministic=False and dropout_rate > 0"
            )
        dropout_rng = jax.random.PRNGKey(0)  # dummy; dropout branch unused
    if vjp == "flash":
        body = _flash_vanilla(cp, float(dropout_rate), bool(deterministic))
    else:
        body = functools.partial(
            _vanilla_body, cp=cp, dropout_rate=dropout_rate,
            deterministic=deterministic,
        )
    qkv_spec = P(DATA_AXIS, MODEL_AXIS, CONTEXT_AXIS, None)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec,
                  P(DATA_AXIS, CONTEXT_AXIS), P()),
        out_specs=qkv_spec,
        check_vma=False,
    )(q, k, v, key_mask, dropout_rng)


def _realformer_body(q, k, v, prev, qmask, *, cp: int, use_prev: bool,
                     use_mask: bool):
    """Per-shard body. q/k/v: (b, t_loc, h, e); prev: (b, t_loc, T, h);
    qmask: (b, t_loc).

    The carried score tensor is sharded along its QUERY axis only — each
    ring step writes its key-block column slice at the visiting block's
    global offset. The reference's query-axis mask subtracts a constant
    per softmax row (ops.attention docstring) — mathematically softmax-
    invariant, but the finite -10000 rounds ~3 decimal digits off the
    masked rows' f32 scores BEFORE softmax, and that rounding is part of
    the reference numerics; we therefore subtract it into the online-
    softmax input too, exactly like the XLA path.
    """
    B, Tq, H, E = q.shape
    Tk = k.shape[1]
    Tfull = Tq * cp
    scale = jnp.sqrt(jnp.asarray(E, jnp.float32)).astype(q.dtype)
    me = lax.axis_index(CONTEXT_AXIS)

    m = None
    l = None
    o = None
    scores_out = jnp.zeros((B, Tq, Tfull, H), q.dtype)

    k_cur, v_cur = k, v
    for r in range(cp):
        src = (me - r) % cp  # origin device of the visiting k/v block
        off = src * Tk
        # the whole score chain runs in the COMPUTE dtype, matching
        # ops.attention.realformer_attention exactly: in bf16 the -10000
        # mask constant is 9984 and the subtraction quantizes the masked
        # rows' scores to near-ties (their softmax goes ~uniform) — that
        # quantization is part of the reference numerics and the carried
        # score tensor, so it must happen BEFORE the f32 softmax cast.
        s = jnp.einsum("bihe,bjhe->bijh", q, k_cur.astype(q.dtype)) / scale
        if use_prev:
            s = s + lax.dynamic_slice(
                prev, (0, 0, off, 0), (B, Tq, Tk, H)
            ).astype(s.dtype)
        if use_mask:
            s = s - (NEG_BIG * (1.0 - qmask.astype(s.dtype)))[
                :, :, None, None]
        scores_out = lax.dynamic_update_slice(
            scores_out, s.astype(q.dtype), (0, 0, off, 0))
        s = s.astype(jnp.float32)
        blk_max = jnp.max(s, axis=2, keepdims=True)
        m_new = blk_max if m is None else jnp.maximum(m, blk_max)
        p = jnp.exp(s - m_new)
        pv = jnp.einsum(
            "bijh,bjhe->bihe", p.astype(q.dtype), v_cur
        ).astype(jnp.float32)
        if m is None:
            l = jnp.sum(p, axis=2, keepdims=True)
            o = pv
        else:
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=2, keepdims=True)
            # corr (b, Tq, 1, h) -> (b, Tq, h, 1) broadcasts onto o's
            # (b, Tq, h, e)
            o = o * jnp.swapaxes(corr, 2, 3) + pv
        m = m_new
        if r + 1 < cp:
            k_cur = lax.ppermute(k_cur, CONTEXT_AXIS, _ring_perm(cp))
            v_cur = lax.ppermute(v_cur, CONTEXT_AXIS, _ring_perm(cp))
    ctx = (o / jnp.swapaxes(l, 2, 3)).astype(q.dtype)
    return ctx, scores_out


def ring_realformer_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    prev: Optional[jax.Array],
    query_mask: Optional[jax.Array],
    mesh,
) -> Tuple[jax.Array, jax.Array]:
    """Sequence-parallel equivalent of ops.attention.realformer_attention.

    q/k/v: (B, T, H, E) (head axis third, realformer.py:32-33); prev:
    (B, T, T, H) carried scores, sharded over the query axis — per-device
    score memory is (T/cp)·T·H, the 1/cp scaling GSPMD's all-gather
    lowering does not give.

    Backward is plain autodiff: the RealFormer's carried score tensor is
    itself O((T/cp)·T) per device, so a flash-style rematerializing VJP
    (see the vanilla flavor) cannot improve the asymptotic — the
    architecture's residual-score carry IS the memory floor.
    """
    cp = mesh.shape[CONTEXT_AXIS]
    B, T, H, _ = q.shape
    if T % cp:
        raise ValueError(f"ring attention needs T({T}) % cp({cp}) == 0")
    use_prev = prev is not None
    use_mask = query_mask is not None
    if prev is None:
        prev = jnp.zeros((B, T, T, H), q.dtype)
    if query_mask is None:
        query_mask = jnp.ones((B, T), jnp.float32)
    body = functools.partial(
        _realformer_body, cp=cp, use_prev=use_prev, use_mask=use_mask)
    qkv_spec = P(DATA_AXIS, CONTEXT_AXIS, MODEL_AXIS, None)
    score_spec = P(DATA_AXIS, CONTEXT_AXIS, None, MODEL_AXIS)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, score_spec,
                  P(DATA_AXIS, CONTEXT_AXIS)),
        out_specs=(qkv_spec, score_spec),
        check_vma=False,
    )(q, k, v, prev, query_mask)
