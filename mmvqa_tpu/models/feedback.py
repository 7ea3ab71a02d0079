"""Feedback Transformer encoder (models/feedback_transformer_pytorch.py:197-322).

Segment-recurrent encoder: the (already-fused) input sequence is split into
``seq_len=2`` windows; each window's layers attend to a FIFO memory of
layer-weighted aggregated hiddens plus causally-masked self tokens, with a
T5-style relative position bias; after each window the aggregated hiddens are
pushed through a K/V projection SHARED BY ALL LAYERS into the memory.

TPU re-design: the sequential Python loop over ``x.split(seq_len)`` becomes a
``flax.linen.scan`` over segments with a FIXED-SIZE (B, M, inner) memory
buffer and a validity count as carry — no dynamic shapes under jit. Odd-length
sequences are padded to a whole window and a per-window ``n_valid`` input
reproduces the reference's remainder semantics (a 1-token window attends to
memory ONLY — ``self_attend = n > 1``, reference :163-172). The reference
wrapper feeds embeddings straight through (token_emb bypassed, :260) and
never applies the padding mask (mmbert.py:125-127); both preserved.

FIFO truncation (reference :309-310 ``memory[:, -mem_len:]``): the fixed
buffer holds ``min(mem_len, padded_T)`` entries oldest-first; when a window's
append would overflow, the buffer rolls left by the overflow amount before
the write, so slot index == the reference's relative key position and the
same T5 bias/bucket math applies untouched.

Dropout: the reference wires ``attn_dropout=0.1, ff_dropout=0.1``
(mmbert.py:120-121), applied to the attention probabilities after softmax
(:188-189) and between GEGLU and the FFN down-projection (:128-133).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_MAX = -3.0e38  # ~ -finfo(f32).max, matching masked_fill_(-finfo.max)


def relative_position_bucket(
    rel_pos: jax.Array, num_buckets: int = 32, max_distance: int = 128
) -> jax.Array:
    """Causal T5 bucket (feedback_transformer_pytorch.py:50-69)."""
    n = jnp.maximum(-rel_pos, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return jnp.where(is_small, n, val_large)


class GEGLUFeedForward(nn.Module):
    """Linear(d, 8d) -> GEGLU -> Linear(4d, d) (:114-136). Note the chunk
    order: ``x, gate = chunk(2)`` and output is ``gelu(gate) * x``."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype, name="w_in")(x)
        val, gate = jnp.split(h, 2, axis=-1)
        z = nn.gelu(gate, approximate=False) * val
        # Dropout sits between GEGLU and the down-projection (:128-133)
        z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, name="w_out")(z)


class FeedbackSegment(nn.Module):
    """Process one window against the memory carry.

    carry: (mem_k, mem_v, count); xs: (xseg (B, n, d), n_valid scalar).
    """

    hidden_size: int
    n_layers: int
    heads: int = 8
    dim_head: int = 64
    num_buckets: int = 32
    max_distance: int = 128
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    deterministic: bool = True
    can_overflow: bool = False  # static: True iff padded_T > buffer size
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        xseg, n_valid = xs
        mem_k, mem_v, count = carry  # (B, M, inner), (B, M, inner), scalar
        B, n, d = xseg.shape
        M = mem_k.shape[1]
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh ** -0.5

        to_kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                         name="shared_kv")
        rel_bias = nn.Embed(self.num_buckets, h,
                            embedding_init=nn.initializers.normal(1.0),
                            dtype=self.dtype, name="rel_bias")
        layer_weight = self.param(
            "layer_weight", nn.initializers.ones, (self.n_layers + 1,)
        )

        # --- relative position bias + validity masks over (n, M + n) keys ---
        q_pos = jnp.arange(n)[:, None]                      # local 0..n-1
        mem_slot = jnp.arange(M)[None, :]                   # k_pos = slot idx
        self_pos = count + jnp.arange(n)[None, :]           # k_pos = count + t
        rel = jnp.concatenate(
            [jnp.broadcast_to(mem_slot, (n, M)),
             jnp.broadcast_to(self_pos, (n, n))], axis=1
        ) - q_pos
        bias = rel_bias(relative_position_bucket(
            rel, self.num_buckets, self.max_distance
        ))  # (n, M+n, heads)
        bias = jnp.transpose(bias, (2, 0, 1))[None]          # (1, h, n, M+n)
        invalid_mem = jnp.broadcast_to(mem_slot >= count, (n, M))
        causal = jnp.arange(n)[None, :] > jnp.arange(n)[:, None]
        # reference remainder semantics: a 1-valid-token window has NO self
        # kv at all (self_attend = n > 1, reference :163-172) — mask every
        # self column, not just the padded ones
        self_invalid = jnp.where(n_valid > 1, causal, jnp.ones_like(causal))
        key_invalid = jnp.concatenate(
            [invalid_mem, self_invalid], axis=1
        )  # (n, M+n)

        x = xseg
        hiddens = [x]
        for li in range(self.n_layers):
            y = nn.LayerNorm(dtype=self.dtype, name=f"attn_norm_{li}")(x)
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name=f"to_q_{li}")(y) * scale
            skv, svv = jnp.split(to_kv(y), 2, axis=-1)
            k = jnp.concatenate([mem_k, skv], axis=1)        # (B, M+n, inner)
            v = jnp.concatenate([mem_v, svv], axis=1)
            qh = q.reshape(B, n, h, dh).transpose(0, 2, 1, 3)
            kh = k.reshape(B, M + n, h, dh).transpose(0, 2, 1, 3)
            vh = v.reshape(B, M + n, h, dh).transpose(0, 2, 1, 3)
            sim = jnp.einsum("bhid,bhjd->bhij", qh, kh) + bias
            sim = jnp.where(key_invalid[None, None], NEG_MAX, sim)
            att = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(
                x.dtype
            )
            # attention-prob dropout (reference :188-189)
            att = nn.Dropout(self.attn_dropout, name=f"attn_drop_{li}")(
                att, deterministic=self.deterministic
            )
            ctx = jnp.einsum("bhij,bhjd->bhid", att, vh)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, n, inner)
            x = x + nn.Dense(d, dtype=self.dtype, name=f"to_out_{li}")(ctx)

            y = nn.LayerNorm(dtype=self.dtype, name=f"ff_norm_{li}")(x)
            x = x + GEGLUFeedForward(
                d, dropout=self.ff_dropout, dtype=self.dtype, name=f"ff_{li}"
            )(y, deterministic=self.deterministic)
            hiddens.append(x)

        # layer-weighted aggregate -> shared kv proj -> append to memory
        w = jax.nn.softmax(layer_weight)
        agg = jnp.einsum("l,lbnd->bnd", w, jnp.stack(hiddens))
        new_k, new_v = jnp.split(to_kv(agg), 2, axis=-1)
        if self.can_overflow:
            # FIFO truncation (reference :309-310): roll the oldest entries
            # out so valid slots stay [0, count) oldest-first, preserving
            # slot index == relative key position for the T5 bias.
            shift = jnp.maximum(count + n - M, 0)
            mem_k = jnp.roll(mem_k, -shift, axis=1)
            mem_v = jnp.roll(mem_v, -shift, axis=1)
            write_at = count - shift
        else:
            shift = 0
            write_at = count
        mem_k = jax.lax.dynamic_update_slice(mem_k, new_k, (0, write_at, 0))
        mem_v = jax.lax.dynamic_update_slice(mem_v, new_v, (0, write_at, 0))
        return (mem_k, mem_v, count - shift + n_valid), x


# Unroll factor for the window scan. The recurrence is inherently
# sequential (each 2-token window reads the memory the previous window
# wrote — feedback_transformer_pytorch.py:275-310), so at T=75 the encoder
# pays the per-scan-iteration dispatch floor ~38x per pass; unrolling was
# the candidate amortization. MEASURED (v5e, B=128, K=30, tools/perf.py
# feedback_unroll=N): unroll=2 268.8 ms vs unroll=1 263.5 ms (WORSE — the
# floor is not loop overhead), unroll=4 OOMs HBM (16.8G > 15.75G: XLA
# keeps each unrolled body's saved activations live). Stays 1.
SCAN_UNROLL = 1


class FeedbackEncoder(nn.Module):
    """Scan FeedbackSegment over windows (reference wiring mmbert.py:110-127:
    dim=hidden, depth=n_layers, seq_len=2, mem_len=256, dim_head=64, heads=8)."""

    hidden_size: int
    n_layers: int
    seq_len: int = 2
    mem_len: int = 256
    heads: int = 8
    dim_head: int = 64
    # reference wiring hardwires 0.1/0.1 (mmbert.py:120-121)
    attn_dropout: float = 0.1
    ff_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask=None, deterministic: bool = True
    ) -> jax.Array:
        del mask  # reference never applies the padding mask (mmbert.py:125-127)
        B, T, d = x.shape
        if self.mem_len < self.seq_len:
            raise ValueError("mem_len must be >= seq_len")
        n_seg = -(-T // self.seq_len)
        T_pad = n_seg * self.seq_len
        if T_pad != T:
            x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
        n_valid = jnp.minimum(
            T - jnp.arange(n_seg) * self.seq_len, self.seq_len
        ).astype(jnp.int32)

        # the FIFO never holds more than mem_len entries (reference :309-310)
        M = min(self.mem_len, T_pad)
        mem_k = jnp.zeros((B, M, self.heads * self.dim_head), self.dtype)
        mem_v = jnp.zeros_like(mem_k)
        carry = (mem_k, mem_v, jnp.asarray(0, jnp.int32))

        ScanSeg = nn.scan(
            FeedbackSegment,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
            unroll=SCAN_UNROLL,
        )
        segs = x.reshape(B, n_seg, self.seq_len, d).transpose(1, 0, 2, 3)
        _, outs = ScanSeg(
            hidden_size=self.hidden_size,
            n_layers=self.n_layers,
            heads=self.heads,
            dim_head=self.dim_head,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            deterministic=deterministic,
            can_overflow=T_pad > M,
            dtype=self.dtype,
            name="segment",
        )(carry, (segs, n_valid))
        out = outs.transpose(1, 0, 2, 3).reshape(B, T_pad, d)
        return out[:, :T]
