"""Pre/post-norm BERT encoder with weight-sharing modes.

Re-design of models/transformer.py:50-98 as Flax modules. The reference's
``BertLayer`` is constructed ONCE and indexed per layer, which yields two
load-bearing quirks that we preserve:

* with ``share='none'`` the attention/proj/FFN stacks are per-layer but the
  two LayerNorms are single modules shared by EVERY layer;
* the pre-norm path applies ``norm1`` before BOTH the attention and the FFN
  (``norm2`` is never used in 'pre' mode, transformer.py:76-86).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmvqa_tpu.ops.activations import gelu_erf
from mmvqa_tpu.ops.attention import vanilla_attention


class MultiHeadedSelfAttention(nn.Module):
    """Q/K/V projections + key-masked softmax attention with prob dropout
    (transformer.py:10-30)."""

    hidden_size: int
    n_heads: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        B, T, H = x.shape
        d = H // self.n_heads
        dense = lambda name: nn.Dense(H, dtype=self.dtype, name=name)
        q, k, v = dense("proj_q")(x), dense("proj_k")(x), dense("proj_v")(x)
        split = lambda t: t.reshape(B, T, self.n_heads, d).transpose(0, 2, 1, 3)
        rng = None if deterministic else self.make_rng("dropout")
        ctx = vanilla_attention(
            split(q), split(k), split(v), mask,
            dropout_rng=rng, dropout_rate=self.dropout_rate,
            deterministic=deterministic,
        )
        return ctx.transpose(0, 2, 1, 3).reshape(B, T, H)


class PositionWiseFeedForward(nn.Module):
    """fc2(gelu(fc1(x))) with 4x expansion (transformer.py:42-48)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.hidden_size * 4, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(gelu_erf(h))


class BertEncoder(nn.Module):
    """n_layers of (attention -> proj -> residual, FFN -> residual) with the
    reference's share modes and norm placement (transformer.py:50-98).
    """

    hidden_size: int
    n_layers: int
    n_heads: int
    dropout_rate: float
    share: str = "none"   # 'none' | 'all' | 'att' | 'ffn'
    norm_pos: str = "pre"  # 'pre' | 'post'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        # Shared-by-every-layer norms (reference quirk, see module docstring).
        norm1 = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm2")

        share_att = self.share in ("all", "att")
        share_ffn = self.share in ("all", "ffn")

        def make_att(i: int) -> MultiHeadedSelfAttention:
            name = "attention" if share_att else f"attention_{i}"
            return MultiHeadedSelfAttention(
                self.hidden_size, self.n_heads, self.dropout_rate,
                dtype=self.dtype, name=name,
            )

        def make_proj(i: int) -> nn.Dense:
            name = "proj" if share_att else f"proj_{i}"
            return nn.Dense(self.hidden_size, dtype=self.dtype, name=name)

        def make_ffn(i: int) -> PositionWiseFeedForward:
            name = "feedforward" if share_ffn else f"feedforward_{i}"
            return PositionWiseFeedForward(
                self.hidden_size, dtype=self.dtype, name=name
            )

        drop = nn.Dropout(self.dropout_rate)
        for i in range(self.n_layers):
            if self.norm_pos == "pre":
                a = make_proj(i)(make_att(i)(norm1(h), mask, deterministic))
                h = h + drop(a, deterministic=deterministic)
                f = make_ffn(i)(norm1(h))  # norm1 again — reference quirk
                h = h + drop(f, deterministic=deterministic)
            elif self.norm_pos == "post":
                a = make_proj(i)(make_att(i)(h, mask, deterministic))
                out = norm1(h + drop(a, deterministic=deterministic))
                f = make_ffn(i)(out)
                h = norm2(out + drop(f, deterministic=deterministic))
            else:
                raise ValueError(f"unknown norm_pos {self.norm_pos}")
        return h
