"""Image-only baseline classifiers (auxiliary experiment paths).

The reference's ``Model_Keyword`` (vqamed2019/utils.py:306-324) is a CNN
(se_resnext50 via the dead ``pretrainedmodels`` import) whose pooled features
are concatenated with a learned keyword embedding before a linear head, used
by the train/val/test_img_only loops (utils.py:960-1232). Rebuilt here on the
framework's own trunks (ResNet-152 / EfficientNetV2-M) with the same
structure: GAP features [+ keyword embedding] -> linear classifier.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmvqa_tpu.models.effnetv2 import EffNetV2Features
from mmvqa_tpu.models.resnet import ResNetFeatures
from mmvqa_tpu.models.visual_tokens import TINY_EFFNET_ARCH


class ImageOnlyClassifier(nn.Module):
    num_classes: int
    cnn_encoder: str = "tf_efficientnetv2_m"
    num_keywords: int = 0  # >0 enables the keyword-embedding pathway
    tiny: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        img: jax.Array,
        keyword: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
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
        pooled = jnp.mean(feats[-1], axis=(1, 2))  # deepest map GAP
        if self.num_keywords > 0:
            if keyword is None:
                raise ValueError("keyword ids required when num_keywords > 0")
            kemb = nn.Embed(
                self.num_keywords, pooled.shape[-1], dtype=self.dtype,
                name="keyword_embed",
            )(keyword)
            pooled = jnp.concatenate([pooled, kemb], axis=-1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(pooled)
