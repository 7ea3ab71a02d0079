"""EfficientNetV2-M trunk with per-stage feature taps, in Flax.

Replaces the reference's timm ``tf_efficientnetv2_m(features_only=True)``
(image_encoding.py:26,100-115). The architecture follows the EfficientNetV2
paper / timm's v2_m definition:

  stem: conv3x3 s2 -> 24
  stage0: FusedMBConv  x3  k3 s1 e1 -> 24
  stage1: FusedMBConv  x5  k3 s2 e4 -> 48
  stage2: FusedMBConv  x5  k3 s2 e4 -> 80
  stage3: MBConv(SE)   x7  k3 s2 e4 -> 160
  stage4: MBConv(SE)   x14 k3 s1 e6 -> 176
  stage5: MBConv(SE)   x18 k3 s2 e6 -> 304
  stage6: MBConv(SE)   x5  k3 s1 e6 -> 512

``features_only`` 5-tap = stages (0,1,2,4,6): channels [24,48,80,176,512]
(models_dict, image_encoding.py:15); the 7-token variant taps all seven
stages: [24,48,80,160,176,304,512] (image_encoding.py:18). TF-style SAME
padding and BN eps 1e-3 match the tf_ timm variant so pretrained weights can
be imported when supplied.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# (block_type, repeats, kernel, stride, expand, out_ch, se_ratio)
V2_M_ARCH = (
    ("fused", 3, 3, 1, 1, 24, 0.0),
    ("fused", 5, 3, 2, 4, 48, 0.0),
    ("fused", 5, 3, 2, 4, 80, 0.0),
    ("mb", 7, 3, 2, 4, 160, 0.25),
    ("mb", 14, 3, 1, 6, 176, 0.25),
    ("mb", 18, 3, 2, 6, 304, 0.25),
    ("mb", 5, 3, 1, 6, 512, 0.25),
)
V2_M_STEM = 24
FIVE_TAP_STAGES = (0, 1, 2, 4, 6)


# Probe knob (tools/perf.py): False computes BN batch statistics in the
# compute dtype (bf16) instead of forcing fp32 reductions — measures the
# upper bound of the per-block stat-reduce/cast bucket. NOT for training:
# bf16 accumulation over B*H*W elements loses the mean precision.
BN_F32_STATS = True

# Probe knob: express the 1x1 pointwise convs (pw_exp / pw_proj) as
# reshape+dot_general instead of conv_general_dilated. Numerically
# identical and checkpoint-identical (the weight keeps the conv param path
# and (1, 1, K, C) shape via _PwKernel); the hypothesis under test is
# LAYOUT: the TPU conv custom-calls force batch-minor layouts on their
# operands, which is what holds the BN stat/backward fusions at ~100-260
# GB/s effective (round-3 trace, DESIGN.md §7). Matmul outputs keep natural
# layouts.
PW_AS_DOT = False

# Probe knob: stride-1 3x3 depthwise convs via the Pallas VPU kernel
# (ops/pallas_depthwise.py) instead of the XLA conv custom-call. SETTLED
# NEGATIVE (round 3, in-step A/B at B=128 bf16): 191.1 ms/step vs 144.1 —
# 47 ms WORSE. The XLA convs read S(1) VMEM-resident maps (DESIGN.md §7)
# while pallas_call materializes x/dy/dx through HBM (~50 MB each per
# stage-4 site), so the "free the batch-minor layouts" hypothesis loses to
# the residency it destroys. Kept as a correctness-tested probe
# (tests/test_pallas_depthwise.py); 'auto' = Pallas on a single TPU chip,
# True/False force. The param path and shape (dw/kernel, (3,3,1,C)) are
# identical across impls, so checkpoints are topology-independent.
DW_PALLAS = False


def _dw_pallas_active() -> bool:
    if DW_PALLAS == "auto":
        # single-TPU-chip only, matching visual_tokens 'auto': pallas_call
        # has no GSPMD partitioning rules, so under a multi-device mesh the
        # XLA conv path is the right default.
        try:
            return (jax.devices()[0].platform == "tpu"
                    and jax.device_count() == 1)
        except RuntimeError:
            return False
    return bool(DW_PALLAS)


def _bn(train: bool, dtype, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-3,
        dtype=dtype, name=name,
        force_float32_reductions=BN_F32_STATS,
    )


class _PwKernel(nn.Module):
    """Owns a 1x1-conv weight at ``<name>/kernel`` with the nn.Conv shape
    (1, 1, in_ch, out_ch) so PW_AS_DOT keeps checkpoints bit-compatible."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_ch, self.out_ch),
        )


class _DwKernel(nn.Module):
    """Owns a depthwise-conv weight at ``<name>/kernel`` with the nn.Conv
    feature-group shape (k, k, 1, ch) and init, so DW_PALLAS keeps
    checkpoints bit-compatible with the XLA-conv path."""

    kernel: int
    ch: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, 1, self.ch),
        )


def _dw_conv(mdl, x: jax.Array, kernel: int, stride: int,
             name: str) -> jax.Array:
    """Depthwise conv (feature_group_count = channels), routed to the
    Pallas kernel for the stride-1 3x3 sites when DW_PALLAS is active."""
    ch = x.shape[-1]
    if kernel == 3 and stride == 1 and _dw_pallas_active():
        from mmvqa_tpu.ops.pallas_depthwise import depthwise3x3

        w = _DwKernel(kernel=kernel, ch=ch, name=name)()
        return depthwise3x3(
            x.astype(mdl.dtype), w[:, :, 0, :].astype(mdl.dtype)
        )
    return nn.Conv(
        ch, (kernel, kernel), strides=(stride, stride), padding="SAME",
        feature_group_count=ch, use_bias=False, dtype=mdl.dtype, name=name,
    )(x)


def _pw_conv(mdl, x: jax.Array, out_ch: int, name: str) -> jax.Array:
    """1x1 conv, as nn.Conv or (PW_AS_DOT) as a dot over the channel dim."""
    if not PW_AS_DOT:
        return nn.Conv(out_ch, (1, 1), use_bias=False, dtype=mdl.dtype,
                       name=name)(x)
    w = _PwKernel(in_ch=x.shape[-1], out_ch=out_ch, name=name)()
    B, H, W, K = x.shape
    y = jax.lax.dot_general(
        x.reshape(B * H * W, K), w[0, 0].astype(mdl.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
    )
    return y.reshape(B, H, W, out_ch)


class SqueezeExcite(nn.Module):
    reduced_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced_ch, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        h = _pw_conv(self, x, mid, "pw_exp")
        h = nn.silu(_bn(train, self.dtype, "bn1")(h))
        h = _dw_conv(self, h, self.kernel, self.stride, "dw")
        h = nn.silu(_bn(train, self.dtype, "bn2")(h))
        if self.se_ratio > 0:
            # timm reduces relative to the block INPUT channels
            h = SqueezeExcite(
                max(1, int(in_ch * self.se_ratio)), dtype=self.dtype, name="se"
            )(h)
        h = _pw_conv(self, h, self.out_ch, "pw_proj")
        h = _bn(train, self.dtype, "bn3")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class FusedMBConv(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        if self.expand == 1:
            # single conv3x3 -> bn -> silu (timm's FusedMBConv e1 form)
            h = nn.Conv(
                self.out_ch, (self.kernel,) * 2, strides=(self.stride,) * 2,
                padding="SAME", use_bias=False, dtype=self.dtype, name="conv",
            )(x)
            h = nn.silu(_bn(train, self.dtype, "bn1")(h))
        else:
            h = nn.Conv(
                mid, (self.kernel,) * 2, strides=(self.stride,) * 2,
                padding="SAME", use_bias=False, dtype=self.dtype, name="conv_exp",
            )(x)
            h = nn.silu(_bn(train, self.dtype, "bn1")(h))
            h = _pw_conv(self, h, self.out_ch, "pw_proj")
            h = _bn(train, self.dtype, "bn2")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class EffNetV2Features(nn.Module):
    """Run the trunk once; return all 7 stage outputs (NHWC)."""

    arch: Sequence = V2_M_ARCH
    stem_ch: int = V2_M_STEM
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, ...]:
        h = nn.Conv(
            self.stem_ch, (3, 3), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        h = nn.silu(_bn(train, self.dtype, "stem_bn")(h))
        taps = []
        for si, (btype, reps, k, s, e, c, se) in enumerate(self.arch):
            for bi in range(reps):
                stride = s if bi == 0 else 1
                name = f"stage{si}_block{bi}"
                if btype == "fused":
                    h = FusedMBConv(c, k, stride, e, dtype=self.dtype,
                                    name=name)(h, train)
                else:
                    h = MBConv(c, k, stride, e, se, dtype=self.dtype,
                               name=name)(h, train)
            taps.append(h)
        return tuple(taps)
