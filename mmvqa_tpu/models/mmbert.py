"""Top-level multimodal model (the reference's ``Model``, mmbert.py:129-172).

Text tokens are embedded BERT-style; the CNN's multi-scale visual tokens then
OVERWRITE embedded positions 0..num_vis-1 — including position 0 ([CLS]) —
which is the reference's off-by-one fusion quirk (mmbert.py:64-66 writes
positions 0..num_vis-1 while encode_text reserves 1..num_vis; preserved for
parity). The fused sequence runs through the selected encoder, then either a
per-token MLM head or a mean-pooled classification head.

The per-sample Python fusion loop becomes one vectorized concatenate; the
heads are plain fused matmuls.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmvqa_tpu.core.config import Config
from mmvqa_tpu.models.embeddings import BertEmbeddings
from mmvqa_tpu.models.feedback import FeedbackEncoder
from mmvqa_tpu.models.realformer import RealFormerEncoder
from mmvqa_tpu.models.transformer import BertEncoder
from mmvqa_tpu.models.visual_tokens import VisualTokenizer
from mmvqa_tpu.ops.activations import serf


def mean_pooling(h: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Masked mean over the sequence axis (mmbert.py:169-172)."""
    m = attention_mask[..., None].astype(h.dtype)
    return jnp.sum(h * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), min=1e-9)


class MMBert(nn.Module):
    """Unified model for ROCO pretraining and VQA-Med fine-tuning."""

    cfg: Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg

        def _dp(rate: float) -> float:
            """Reference dropout rate, unless cfg.dropout_override pins all
            rates (trajectory-parity harness)."""
            return rate if cfg.dropout_override is None else cfg.dropout_override

        self.bert_embedding = BertEmbeddings(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            type_vocab_size=cfg.type_vocab_size,
            dropout_rate=_dp(0.1),
            dtype=self.dtype,
        )
        self.trans = VisualTokenizer(
            cnn_encoder=cfg.cnn_encoder,
            num_vis=cfg.num_vis,
            hidden_size=cfg.hidden_size,
            use_relu=cfg.use_relu,
            tiny=cfg.tiny_cnn,
            token_head_impl=cfg.token_head,
            dtype=self.dtype,
        )
        if "feedback-transformer" in cfg.transformer_model:
            self.encoder = FeedbackEncoder(
                hidden_size=cfg.hidden_size,
                n_layers=cfg.n_layers,
                attn_dropout=_dp(0.1),
                ff_dropout=_dp(0.1),
                dtype=self.dtype,
            )
        elif "realformer" in cfg.transformer_model:
            if cfg.pp_size > 1:
                # Pipeline-parallel layer stack (parallel/pipeline.py):
                # same math; the residual score carry hops stages with
                # the activations
                from mmvqa_tpu.parallel.pipeline import (
                    PipelinedRealFormerEncoder,
                )

                self.encoder = PipelinedRealFormerEncoder(
                    hidden_size=cfg.hidden_size,
                    n_layers=cfg.n_layers,
                    head_cnt=8,  # mmbert.py:100
                    dp1=_dp(0.1),
                    dp2=_dp(0.1),
                    n_microbatches=cfg.pp_microbatches,
                    dtype=self.dtype,
                )
            else:
                self.encoder = RealFormerEncoder(
                    hidden_size=cfg.hidden_size,
                    n_layers=cfg.n_layers,
                    head_cnt=8,  # mmbert.py:100
                    dp1=_dp(0.1),
                    dp2=_dp(0.1),
                    dtype=self.dtype,
                )
        elif "transformer" in cfg.transformer_model:
            if cfg.pp_size > 1:
                # Pipeline-parallel layer stack (parallel/pipeline.py):
                # same math, layer-stacked params over the 'pipe' mesh axis
                from mmvqa_tpu.parallel.pipeline import PipelinedBertEncoder

                self.encoder = PipelinedBertEncoder(
                    hidden_size=cfg.hidden_size,
                    n_layers=cfg.n_layers,
                    n_heads=cfg.heads,
                    dropout_rate=_dp(cfg.hidden_dropout_prob),
                    norm_pos="pre",  # mmbert.py:87
                    n_microbatches=cfg.pp_microbatches,
                    dtype=self.dtype,
                )
            else:
                self.encoder = BertEncoder(
                    hidden_size=cfg.hidden_size,
                    n_layers=cfg.n_layers,
                    n_heads=cfg.heads,
                    dropout_rate=_dp(cfg.hidden_dropout_prob),
                    share="none",
                    norm_pos="pre",  # mmbert.py:87
                    dtype=self.dtype,
                )
        else:
            raise NotImplementedError(cfg.transformer_model)

        self.fc1 = nn.Dense(cfg.hidden_size, dtype=self.dtype)
        # classifier = [Dense, LayerNorm(1e-12), Dense(out)] (mmbert.py:135-137)
        self.classifier_0 = nn.Dense(cfg.hidden_size, dtype=self.dtype)
        self.classifier_ln = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)
        out_dim = (
            cfg.num_classes
            if cfg.dataset == "VQA-Med" and cfg.num_classes > 0
            else cfg.vocab_size
        )
        self.classifier_2 = nn.Dense(out_dim, dtype=self.dtype)
        if cfg.supcon:
            self.head_0 = nn.Dense(cfg.hidden_size, dtype=self.dtype)
            self.head_2 = nn.Dense(cfg.feat_dim, dtype=self.dtype)

    def _classifier(self, x: jax.Array) -> jax.Array:
        return self.classifier_2(self.classifier_ln(self.classifier_0(x)))

    def encode(
        self,
        img: jax.Array,
        input_ids: jax.Array,
        segment_ids: jax.Array,
        input_mask: jax.Array,
        deterministic: bool = True,
        train_cnn: bool = False,
        perturb: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        """prepare_input + encoder (mmbert.py:60-67, 90-108).

        Returns (hidden states, CNN stage features for Grad-CAM).
        """
        tokens, feats = self.trans(img, train=train_cnn, perturb=perturb)
        h = self.bert_embedding(input_ids, segment_ids, deterministic)
        vis = jnp.stack(
            [t.astype(h.dtype) for t in tokens], axis=1
        )  # (B, num_vis, H)
        h = jnp.concatenate([vis, h[:, vis.shape[1]:]], axis=1)
        h = self.encoder(h, input_mask, deterministic)
        return h, feats

    def __call__(
        self,
        img: jax.Array,
        input_ids: jax.Array,
        segment_ids: jax.Array,
        input_mask: jax.Array,
        deterministic: bool = True,
        train_cnn: Optional[bool] = None,
    ):
        cfg = self.cfg
        if train_cnn is None:
            train_cnn = not deterministic
        h, _ = self.encode(
            img, input_ids, segment_ids, input_mask, deterministic, train_cnn
        )
        if cfg.dataset == "roco":
            if cfg.task == "MLM":
                logits = self._classifier(serf(self.fc1(h)))
                if cfg.supcon:
                    pooled = mean_pooling(h, input_mask)
                    feat = self.head_2(serf(self.head_0(pooled)))
                    feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
                    return logits, feat
                return logits
            elif cfg.task == "distillation":
                return h
            raise NotImplementedError(cfg.task)
        elif cfg.dataset == "VQA-Med":
            pooled = serf(self.fc1(mean_pooling(h, input_mask)))
            return self._classifier(pooled)
        raise NotImplementedError(cfg.dataset)

    def features_and_logits(
        self,
        img: jax.Array,
        input_ids: jax.Array,
        segment_ids: jax.Array,
        input_mask: jax.Array,
        perturb: Optional[jax.Array] = None,
    ):
        """VQA logits plus CNN stage features (Grad-CAM support): ``perturb``
        (a zeros array shaped like the deepest tapped map) is added to that
        map, so grad w.r.t. it gives d logit / d activation — the functional
        equivalent of the reference's backward hooks (grad_cam2.py:139-152)."""
        h, feats = self.encode(
            img, input_ids, segment_ids, input_mask, True, perturb=perturb
        )
        pooled = serf(self.fc1(mean_pooling(h, input_mask)))
        return self._classifier(pooled), feats
