"""BERT-style input embeddings.

The reference extracts the embedding module of HF ``bert-base-uncased``
(mmbert.py:52-56): word + position + token-type embedding sums, LayerNorm
(eps 1e-12) and dropout p=0.1. Re-implemented natively; a weight-import hook
(``mmvqa_tpu.models.import_torch``) can load the pretrained table when the
user supplies the checkpoint file (no network access is assumed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class BertEmbeddings(nn.Module):
    vocab_size: int = 30522
    hidden_size: int = 768
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout_rate: float = 0.1  # HF BertConfig.hidden_dropout_prob default
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        token_type_ids: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        init = nn.initializers.normal(stddev=0.02)
        word = nn.Embed(
            self.vocab_size, self.hidden_size, embedding_init=init,
            dtype=self.dtype, name="word_embeddings",
        )(input_ids)
        # pin the lookup output to the (data, context) activation layout:
        # idiomatic GSPMD hint AND a guard against a jax-0.9.0 SPMD
        # partitioner miscompile on vocab-sharded gathers feeding
        # row-parallel matmuls (parallel/sharding.py::constrain_batch_seq)
        from mmvqa_tpu.parallel.sharding import constrain_batch_seq

        word = constrain_batch_seq(word)
        T = input_ids.shape[-1]
        pos_table = self.param(
            "position_embeddings", init,
            (self.max_position_embeddings, self.hidden_size),
        )
        pos = pos_table[:T][None, :, :].astype(self.dtype)
        typ = nn.Embed(
            self.type_vocab_size, self.hidden_size, embedding_init=init,
            dtype=self.dtype, name="token_type_embeddings",
        )(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm")(x)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
