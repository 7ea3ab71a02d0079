"""Standalone contrastive encoder: backbone + projection head.

Rebuild of SupConEncoder (models/SupConLoss/supcon_utils.py:45-84) — the
old two-model contrastive path where a separate projection model wraps the
CNN (the live reference path instead projects inside Model, mmbert.py:143-148
— see mmvqa_tpu.models.mmbert). Provided for completeness/experiments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmvqa_tpu.models.effnetv2 import EffNetV2Features
from mmvqa_tpu.models.resnet import ResNetFeatures
from mmvqa_tpu.models.visual_tokens import TINY_EFFNET_ARCH


class SupConEncoder(nn.Module):
    cnn_encoder: str = "resnet152"
    head: str = "mlp"  # 'mlp' | 'linear'
    feat_dim: int = 128
    tiny: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        if "resnet" in self.cnn_encoder:
            stages = (1, 1, 1, 1) if self.tiny else (3, 8, 36, 3)
            feats = ResNetFeatures(
                stage_sizes=stages, dtype=self.dtype, name="trunk"
            )(img, train)
        else:
            kw = {"arch": TINY_EFFNET_ARCH} if self.tiny else {}
            feats = EffNetV2Features(dtype=self.dtype, name="trunk", **kw)(
                img, train
            )
        x = jnp.mean(feats[-1], axis=(1, 2))
        if self.head == "linear":
            x = nn.Dense(self.feat_dim, dtype=self.dtype, name="proj")(x)
        elif self.head == "mlp":
            x = nn.Dense(x.shape[-1], dtype=self.dtype, name="proj_hidden")(x)
            x = nn.relu(x)
            x = nn.Dense(self.feat_dim, dtype=self.dtype, name="proj")(x)
        else:
            raise NotImplementedError(f"head not supported: {self.head}")
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
