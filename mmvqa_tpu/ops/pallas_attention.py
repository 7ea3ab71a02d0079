"""Fused Pallas TPU kernel for RealFormer residual attention.

One VMEM-resident program per batch element (all heads) fuses the whole
per-layer attention chain — QK^T scaling, residual-score add, query-axis mask,
softmax, and the P@V contraction — with a custom VJP whose backward is also
a single fused kernel (softmax backward + all four input gradients). This
avoids materializing the (B, H, T, T) probability tensor in HBM twice per
layer that the XLA path costs.

Layouts: head-major. q/k/v are (B, H, T, E) and the score carry is
(B, H, T, T) — Mosaic tiles the LAST TWO dims, so per-head slices are
leading-dim slices (aligned); the reference's (B, T, T, H) einsum layout
would force 1-lane slicing. The carry is opaque between layers (only this
kernel consumes it), so the layout never leaves the encoder; the wrapper in
``mmvqa_tpu.ops.attention`` transposes only the small q/k/v/ctx tensors.

The RealFormer block applies NO dropout on the attention probabilities
(models/realformer.py:30-45 — dropout sits after the output projection), so
the kernel is exactly equivalent to the XLA path; tests pin fwd and grad
agreement. Numerics: MXU accumulation and softmax in fp32. The query-axis
mask is applied ONLY to the stored scores: it is a per-row constant, hence
softmax-invariant (see ops.attention docstring) — skipping it inside the
softmax avoids the -10000k fp32 cancellation the reference suffers on
padded rows.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = 10000.0


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


def _fwd_kernel(q_ref, k_ref, v_ref, prev_ref, mask_ref, ctx_ref, scores_ref,
                *, heads: int, scale: float, has_prev: bool, has_mask: bool):
    # refs are per-batch blocks: q/k/v/ctx (1, H, T, E); prev/scores
    # (1, H, T, T); mask (1, 1, T). Head slices are leading-dim (aligned).
    if has_mask:
        neg = jnp.transpose(
            NEG_BIG * (1.0 - mask_ref[0].astype(jnp.float32))
        )  # (T, 1) query-row column
    for h in range(heads):
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if has_prev:
            s = s + prev_ref[0, h].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=1)
        scores_ref[0, h] = (s - neg) if has_mask else s
        ctx_ref[0, h] = jax.lax.dot_general(
            p, v_ref[0, h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(ctx_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, scores_ref, dctx_ref, dscores_ref,
                dq_ref, dk_ref, dv_ref, dprev_ref,
                *, heads: int, scale: float):
    for h in range(heads):
        s = scores_ref[0, h].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=1)  # mask terms row-constant: invariant
        dctx = dctx_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        dp = jax.lax.dot_general(
            dctx, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        ds = ds + dscores_ref[0, h].astype(jnp.float32)
        dprev_ref[0, h] = ds
        dq_ref[0, h] = (
            jax.lax.dot_general(
                ds, k_ref[0, h], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
        dk_ref[0, h] = (
            jax.lax.dot_general(
                ds, q_ref[0, h], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dk_ref.dtype)
        dv_ref[0, h] = jax.lax.dot_general(
            p, dctx, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)


def _specs(B, H, T, E):
    qkv = pl.BlockSpec(
        (1, H, T, E), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    score = pl.BlockSpec(
        (1, H, T, T), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    mask = pl.BlockSpec(
        (1, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return qkv, score, mask


def _fwd_call(q, k, v, prev, mask):
    B, H, T, E = q.shape
    scale = 1.0 / (E ** 0.5)
    has_prev = prev is not None
    has_mask = mask is not None
    qkv_spec, score_spec, mask_spec = _specs(B, H, T, E)

    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
    if has_prev:
        in_specs.append(score_spec)
        args.append(prev)
    if has_mask:
        in_specs.append(mask_spec)
        args.append(mask.reshape(B, 1, T))

    def kernel_wrap(*refs):
        i = 3
        prev_ref = refs[i] if has_prev else None
        i += int(has_prev)
        mask_ref = refs[i] if has_mask else None
        i += int(has_mask)
        _fwd_kernel(
            refs[0], refs[1], refs[2], prev_ref, mask_ref,
            refs[i], refs[i + 1],
            heads=H, scale=scale, has_prev=has_prev, has_mask=has_mask,
        )

    return pl.pallas_call(
        kernel_wrap,
        grid=(B,),
        in_specs=in_specs,
        out_specs=(qkv_spec, score_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, T, E), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, T), jnp.float32),
        ),
        interpret=_interpret(),
    )(*args)


def _bwd_call(q, k, v, scores, dctx, dscores):
    B, H, T, E = q.shape
    scale = 1.0 / (E ** 0.5)
    qkv_spec, score_spec, _ = _specs(B, H, T, E)
    kernel = functools.partial(_bwd_kernel, heads=H, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[qkv_spec] * 3 + [score_spec, qkv_spec, score_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec, score_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, T, E), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, E), k.dtype),
            jax.ShapeDtypeStruct((B, H, T, E), v.dtype),
            jax.ShapeDtypeStruct((B, H, T, T), jnp.float32),
        ),
        interpret=_interpret(),
    )(q, k, v, scores, dctx, dscores)


@jax.custom_vjp
def _core(q, k, v, prev, mask):
    return _fwd_call(q, k, v, prev, mask)


def _core_fwd(q, k, v, prev, mask):
    ctx, scores = _fwd_call(q, k, v, prev, mask)
    return (ctx, scores), (q, k, v, scores, mask, prev is not None)


def _core_bwd(res, cotangents):
    q, k, v, scores, mask, had_prev = res
    dctx, dscores = cotangents
    dq, dk, dv, dprev = _bwd_call(
        q, k, v, scores, dctx.astype(q.dtype), dscores.astype(jnp.float32)
    )
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, (dprev if had_prev else None), dmask


_core.defvjp(_core_fwd, _core_bwd)


def realformer_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    prev: Optional[jax.Array],
    query_mask: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Reference-layout wrapper: q/k/v (B, T, H, E), prev/scores (B, H, T, T)
    (head-major carry — opaque between layers). Returns (ctx (B, T, H, E),
    scores (B, H, T, T))."""
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    mask = None if query_mask is None else query_mask.astype(jnp.float32)
    ctx, scores = _core(qh, kh, vh, prev, mask)
    return ctx.transpose(0, 2, 1, 3).astype(q.dtype), scores


def scores_to_reference_layout(scores: jax.Array) -> jax.Array:
    """(B, H, T, T) kernel carry -> the reference's (B, T, T, H)."""
    return scores.transpose(0, 2, 3, 1)
