"""RealFormer: residual-attention encoder (models/realformer.py:9-52).

Each block threads the raw pre-softmax score tensor to the next block. The
per-block design quirks preserved from the reference:

* the K/Q/V projection is ONE ``Linear(emb_s, 3*emb_s, bias=False)`` applied
  per head with weights SHARED across heads (realformer.py:13,32-33) — not a
  full hidden->3*hidden projection;
* split order is (k, q, v) (realformer.py:33);
* the output projection is bias-free; dropout dp1 follows it;
* post-norm: ``x = ln1(x + mha); x = ln2(x + ff(x))`` (realformer.py:47-51);
* the FFN uses SERF with a trailing dropout dp2 (realformer.py:21-27);
* the padding mask hits the QUERY axis of the scores (a softmax no-op — see
  mmvqa_tpu.ops.attention docstring) and is baked into the carried ``prev``.

The layer stack threads ``(h, prev)`` exactly like mmbert.py:105-107.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmvqa_tpu.ops.activations import serf
from mmvqa_tpu.ops.attention import realformer_attention


class ResEncoderBlock(nn.Module):
    emb_s: int
    head_cnt: int = 8
    dp1: float = 0.1
    dp2: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        prev: Optional[jax.Array],
        mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        B, T, emb = x.shape
        xh = x.reshape(B, T, self.head_cnt, self.emb_s)
        kqv = nn.Dense(
            3 * self.emb_s, use_bias=False, dtype=self.dtype, name="kqv"
        )(xh)
        k, q, v = jnp.split(kqv, 3, axis=-1)
        ctx, new_prev = realformer_attention(q, k, v, prev, mask)
        res = ctx.reshape(B, T, emb)
        res = nn.Dense(emb, use_bias=False, dtype=self.dtype, name="proj")(res)
        res = nn.Dropout(self.dp1)(res, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x + res)

        f = nn.Dense(4 * emb, dtype=self.dtype, name="ff1")(x)
        f = nn.Dense(emb, dtype=self.dtype, name="ff2")(serf(f))
        f = nn.Dropout(self.dp2)(f, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x + f)
        return x, new_prev


class RealFormerEncoder(nn.Module):
    """Stack of ResEncoderBlocks with the (h, prev) carry (mmbert.py:102-107).

    head_cnt is 8 regardless of the --heads flag (mmbert.py:100).
    """

    hidden_size: int
    n_layers: int
    head_cnt: int = 8
    dp1: float = 0.1
    dp2: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        prev = None
        for i in range(self.n_layers):
            h, prev = ResEncoderBlock(
                emb_s=self.hidden_size // self.head_cnt,
                head_cnt=self.head_cnt,
                dp1=self.dp1,
                dp2=self.dp2,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, prev, mask, deterministic)
        return h
