"""ResNet-152 with multi-stage feature taps, in Flax.

The reference builds five truncated ``nn.Sequential`` prefixes of
torchvision's resnet152 and runs the image through each of them per forward
(image_encoding.py:71-87) — an O(5x) recompute. Here the trunk runs ONCE and
emits the same five tensors as taps:

  stem (64ch, 112x112, pre-maxpool)  == children[:-7]
  layer1 (256, 56)  == children[:-5]
  layer2 (512, 28)  == children[:-4]
  layer3 (1024, 14) == children[:-3]
  layer4 (2048, 7)  == children[:-2]

Convolution/BN hyperparameters mirror torchvision (explicit padding, BN
eps 1e-5 momentum 0.1) so pretrained weights can be imported 1:1.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    width: int
    stride: int = 1
    expansion: int = 4
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
            use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        out = nn.relu(bn("bn1")(conv(self.width, 1, 1, 0, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.width, 3, self.stride, 1, "conv2")(out)))
        out = bn("bn3")(conv(self.width * self.expansion, 1, 1, 0, "conv3")(out))
        if self.has_downsample:
            identity = bn("downsample_bn")(
                conv(self.width * self.expansion, 1, self.stride, 0,
                     "downsample_conv")(x)
            )
        return nn.relu(out + identity)


class ResNetFeatures(nn.Module):
    """Returns (stem64, c256, c512, c1024, c2048) feature maps (NHWC)."""

    stage_sizes: Sequence[int] = (3, 8, 36, 3)  # resnet152
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, ...]:
        stem = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        stem = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(stem)
        stem = nn.relu(stem)  # 64ch @ 112 — the reference's shallowest tap

        h = nn.max_pool(
            stem, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        taps = []
        widths = (64, 128, 256, 512)
        for si, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = Bottleneck(
                    width=w,
                    stride=stride,
                    has_downsample=(bi == 0),
                    dtype=self.dtype,
                    name=f"layer{si + 1}_block{bi}",
                )(h, train)
            taps.append(h)
        c256, c512, c1024, c2048 = taps
        return stem, c256, c512, c1024, c2048
