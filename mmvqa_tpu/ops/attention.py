"""Multi-head attention compute cores.

Two flavors, matching the reference's two encoders bit-for-bit at fp32:

* ``vanilla_attention`` — BERT-style key-masked softmax attention with
  dropout on the attention probabilities (models/transformer.py:19-30).
* ``realformer_attention`` — residual-attention: the raw pre-softmax score
  tensor from the previous layer is added to this layer's scores before
  softmax and the post-mask score tensor is handed to the next layer
  (models/realformer.py:30-45). NB reference quirk, preserved: the RealFormer
  applies its padding mask along the *query* axis (realformer.py:40-41),
  which subtracts a constant from every softmax row — i.e. the attention
  weights are unaffected by padding; only the carried score tensor changes.

Four impls: ``'xla'`` (default via ``'auto'``), ``'pallas'`` (fused
single-program kernel — loses at T=75 where XLA's batched matmuls already
saturate the MXU, and its VMEM-resident per-batch design caps T at ~300:
server-side compile fails beyond that, tools/bench_attention_longseq.py),
``'ring'`` (blockwise ring attention over the 'context' mesh axis,
ops/ring_attention.py — THE long-sequence path), and ``'auto'`` resolving
through ``IMPL_DEFAULT``. Numerics are tested to agree.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_BIG = 10000.0

# Mesh used by the 'ring' impl (ops/ring_attention.py): set it (e.g. from
# the trainer: attention.RING_MESH = mesh_spec.mesh) and pass impl='ring'
# or set IMPL_DEFAULT = 'ring' to run blockwise ring attention over the
# 'context' axis instead of GSPMD's all-gather lowering. Stays None in the
# reference regime (T=75/28 — sequence parallelism is a no-op there).
RING_MESH = None
IMPL_DEFAULT = "auto"


def _pick_impl(impl: str) -> str:
    """'auto' currently resolves to the XLA path everywhere: at the model's
    tiny sequence lengths (75/28) XLA's fused attention beats the Pallas
    kernel in train fwd+bwd (7.8 vs 12.2 ms/step at B=128 on v5e). The
    Pallas kernel stays available via impl='pallas' and is numerics-tested;
    revisit if sequence lengths grow (blockwise CP, SURVEY.md §5.7)."""
    if impl == "auto":
        impl = IMPL_DEFAULT
    if impl == "auto":
        return "xla"
    if impl == "ring" and RING_MESH is None:
        raise ValueError(
            "impl='ring' needs ops.attention.RING_MESH set to the active "
            "('data','model','context') mesh")
    return impl


def vanilla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array],
    *,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    impl: str = "auto",
) -> jax.Array:
    """q, k, v: (B, H, T, D). key_mask: (B, T) 1=real, 0=pad. -> (B, H, T, D).

    scores = q k^T / sqrt(D) - 10000 * (1 - mask_keys); softmax over keys;
    dropout on probabilities; probs @ v. (transformer.py:19-30)
    """
    impl = _pick_impl(impl)
    if impl == "ring":
        from mmvqa_tpu.ops.ring_attention import ring_vanilla_attention

        return ring_vanilla_attention(
            q, k, v, key_mask, RING_MESH,
            dropout_rng=dropout_rng, dropout_rate=dropout_rate,
            deterministic=deterministic,
        )
    d = q.shape[-1]
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, v_cast(k, q)
    ) / jnp.sqrt(jnp.asarray(d, jnp.float32)).astype(q.dtype)
    if key_mask is not None:
        neg = NEG_BIG * (1.0 - key_mask.astype(scores.dtype))
        scores = scores - neg[:, None, None, :]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v)


def v_cast(x: jax.Array, like: jax.Array) -> jax.Array:
    return x.astype(like.dtype)


def realformer_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    prev: Optional[jax.Array],
    query_mask: Optional[jax.Array],
    *,
    impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """q, k, v: (B, T, H, E) (head axis third, per realformer.py:32-33).

    Returns (context (B, T, H, E), new_prev (B, T, T, H)).

    new_prev = q k^T / sqrt(E) [+ prev] - 10000*(1-mask_q)  (realformer.py:35-42)
    att = softmax(new_prev, axis=keys); ctx = att @ v        (realformer.py:43-44)

    impl='pallas' uses the fused single-program kernel with a fused-backward
    custom VJP (mmvqa_tpu.ops.pallas_attention); 'xla' the jnp chain below;
    'auto' picks pallas on TPU.
    """
    impl = _pick_impl(impl)
    if impl == "pallas":
        from mmvqa_tpu.ops.pallas_attention import realformer_attention_pallas

        return realformer_attention_pallas(q, k, v, prev, query_mask)
    if impl == "ring":
        from mmvqa_tpu.ops.ring_attention import ring_realformer_attention

        return ring_realformer_attention(q, k, v, prev, query_mask, RING_MESH)
    e = q.shape[-1]
    scores = jnp.einsum(
        "bihe,bjhe->bijh", q, v_cast(k, q)
    ) / jnp.sqrt(jnp.asarray(e, jnp.float32)).astype(q.dtype)
    if prev is not None:
        scores = scores + v_cast(prev, scores)
    if query_mask is not None:
        neg = NEG_BIG * (1.0 - query_mask.astype(scores.dtype))
        scores = scores - neg[:, :, None, None]
    att = jax.nn.softmax(scores.astype(jnp.float32), axis=2).astype(q.dtype)
    ctx = jnp.einsum("bijh,bjhe->bihe", att, v)
    return ctx, scores
