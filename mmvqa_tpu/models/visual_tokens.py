"""Multi-scale visual tokens: per-stage 1x1 conv -> activation -> GAP.

Re-design of the reference's Transfer family (image_encoding.py:43-226).
The CNN trunk runs ONCE (vs the reference's per-tap prefix re-execution) and
each tapped feature map is projected to ``hidden_size`` with a bias-free 1x1
conv, passed through SERF (or ReLU with --use_relu), and globally
average-pooled into one "visual token" vector.

Token order is preserved per encoder:
* resnet152 @5: deepest-first (2048, 1024, 512, 256, 64ch) —
  ResNetTransfer.forward returns (v_2..v_5, v_7) (image_encoding.py:71-87);
* tf_efficientnetv2_m @5: shallow-first (24, 48, 80, 176, 512ch) —
  Timm_EFfNetV2.forward (image_encoding.py:100-115);
* tf_efficientnetv2_m @7: shallow-first over all 7 stages, always SERF
  (image_encoding.py:185-219). DEVIATION: the reference's 7-token forward
  returns the SUM of the seven tokens (a bug — ``viz_0 + ... + viz_6`` at
  image_encoding.py:219, which then broadcasts scalars into the fusion
  loop); here the seven tokens are returned properly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmvqa_tpu.models.effnetv2 import EffNetV2Features, FIVE_TAP_STAGES
from mmvqa_tpu.models.resnet import ResNetFeatures
from mmvqa_tpu.ops.activations import serf


TINY_EFFNET_ARCH = tuple(
    (b, 1, k, s, e, c, se)
    for (b, _, k, s, e, c, se) in (
        ("fused", 3, 3, 1, 1, 24, 0.0),
        ("fused", 5, 3, 2, 4, 48, 0.0),
        ("fused", 5, 3, 2, 4, 80, 0.0),
        ("mb", 7, 3, 2, 4, 160, 0.25),
        ("mb", 14, 3, 1, 6, 176, 0.25),
        ("mb", 18, 3, 2, 6, 304, 0.25),
        ("mb", 5, 3, 1, 6, 512, 0.25),
    )
)


# Rematerialize the token heads in backward (backward recomputes conv+act
# instead of saving the (B, H, W, hidden) map — 2.46 GB bf16 for stage 0 at
# B=128). Measured on v5e at B=128: +2.5 ms/step with exact serf, within
# noise (~1 ms) once FAST_SERF_BF16 landed — the recompute's VPU cost eats
# the traffic saving. Kept OFF: the 'auto' Pallas route (below) solves the
# same materialization without a remat barrier and measures faster.
REMAT_TOKEN_HEAD = False

# 'auto' token-head impl routes stages with H*W >= PALLAS_MIN_POSITIONS
# AND input channels <= PALLAS_MAX_CHANNELS to the Pallas kernel. Round-3
# retunes (tools/perf.py / tools/bench_token_head.py):
# * exact-divisor position tiling (_pick_tile) flipped stage1 (3136
#   positions, K=48) to pallas — micro 3.99 vs 5.09 ms XLA, in-step 139.7
#   vs 140.7 ms (916 vs 909 img/s) — where the old fixed 2048-lane tile
#   made it a wash (23% padding). Stage 2 (784 positions) stays conv.
# * resnet stem (12544 positions, K=64): pallas wins micro 13.8 vs 17.3.
# * resnet c256 tap (3136 positions, K=256): pallas LOSES in-step 168.7 vs
#   166.7 ms — at K>=256 the MXU contraction is full and XLA's conv wins;
#   the kernel's edge is precisely the small-K underfill regime, hence the
#   channel cap.
PALLAS_MIN_POSITIONS = 3000
PALLAS_MAX_CHANNELS = 128


class _TokenKernel(nn.Module):
    """Owns the 1x1 projection weight at param path ``<name>/kernel`` so
    every token-head impl (conv / einsum / pallas) produces the IDENTICAL
    checkpoint tree: nn.Conv(use_bias=False) stores its weight as
    ``token_conv_<i>/kernel`` of shape (1, 1, K, hidden), and this module
    reproduces exactly that path+shape for the matmul-form impls. Keeps
    checkpoints topology-independent even though 'auto' resolves the impl
    from runtime topology (single-TPU -> pallas, mesh/CPU -> conv)."""

    in_ch: int
    features: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_ch, self.features),
        )


def _conv_token_head(mdl, feat, idx, act_name):
    """conv1x1 -> act -> GAP, in ``mdl``'s param scope (token_conv_<idx>)."""
    proj = nn.Conv(
        mdl.hidden_size, (1, 1), use_bias=False, dtype=mdl.dtype,
        name=f"token_conv_{idx}",
    )(feat)
    act = serf if act_name == "serf" else nn.relu
    return jnp.mean(act(proj), axis=(1, 2))


class VisualTokenizer(nn.Module):
    cnn_encoder: str = "resnet152"
    num_vis: int = 5
    hidden_size: int = 768
    use_relu: bool = False
    tiny: bool = False  # 1-block-per-stage trunks for tests/dryruns
    dtype: jnp.dtype = jnp.float32

    token_head_impl: str = "conv"  # 'conv' | 'einsum' | 'pallas' | 'auto'

    def _resolve_impl(self, feat: jax.Array) -> str:
        """'auto' routes the LARGE early-stage maps (H*W >=
        PALLAS_MIN_POSITIONS) to the streaming Pallas kernel on TPU and
        everything else to the conv form. Deep stages don't amortize the
        kernel's position-tile padding. On a multi-device mesh the kernel
        runs shard_mapped (batch over 'data', channels over 'model' —
        fused_token_head_sharded) when the installed mesh divides the
        shapes; otherwise the conv form keeps XLA in charge."""
        if self.token_head_impl != "auto":
            return self.token_head_impl
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
            single = jax.device_count() == 1
        except RuntimeError:
            return "conv"
        big = feat.shape[1] * feat.shape[2] >= PALLAS_MIN_POSITIONS
        if not (on_tpu and big and feat.shape[-1] <= PALLAS_MAX_CHANNELS):
            return "conv"
        if single:
            return "pallas"
        from mmvqa_tpu.core import mesh as mesh_module

        spec = mesh_module.CURRENT
        # context_size must be 1: the shard_map leaves 'context' unmentioned,
        # so on cp>1 meshes GSPMD would replicate the large stage-0 map
        # across the context axis and every context shard would redundantly
        # run the kernel (correct but a hidden all-gather cost). Force
        # token_head='pallas_sharded' to opt in on cp>1 meshes.
        if (spec is not None
                and spec.context_size == 1
                and feat.shape[0] % spec.data_size == 0
                and self.hidden_size % spec.model_size == 0):
            return "pallas_sharded"
        return "conv"

    def _token(self, feat: jax.Array, idx: int, always_serf: bool = False):
        """GAP(act(conv1x1(feat))) -> one hidden_size token.

        Three impls, all numerics-equivalent (tests): 'conv' (nn.Conv form),
        'einsum' (matmul form), 'pallas' (streaming kernel that never
        materializes the (B, H, W, hidden) map, ops/pallas_token_head.py).
        Same-session A/B at B=128 bf16 full train step: conv 172.1 /
        einsum 175.3 / pallas 177.1 ms. The projected map is a saved
        backward residual (stage 0: 2.46 GB, ~31 ms/step across its 4
        consumer fusions); nn.remat'ing it away measured within noise (see
        REMAT_TOKEN_HEAD) — the dominant cost is the activation's VPU time,
        addressed instead by ops.activations.FAST_SERF_BF16 (+15 ms/step).
        The einsum/pallas weight lives at the SAME param path
        (token_conv_<i>/kernel) and (1, 1, K, C) shape as the nn.Conv form
        (via _TokenKernel) so checkpoints are bit-for-bit tree-compatible
        across impls and topologies (cross-impl restore is tested).
        """
        act_name = "serf" if (always_serf or not self.use_relu) else "relu"
        impl = self._resolve_impl(feat)
        if impl == "conv":
            if REMAT_TOKEN_HEAD:
                head = nn.remat(
                    _conv_token_head,
                    static_argnums=(2, 3),
                    policy=jax.checkpoint_policies.nothing_saveable,
                )
                return head(self, feat, idx, act_name)
            return _conv_token_head(self, feat, idx, act_name)
        w = _TokenKernel(
            in_ch=feat.shape[-1],
            features=self.hidden_size,
            name=f"token_conv_{idx}",
        )()
        B, H, W, K = feat.shape
        x = feat.reshape(B, H * W, K)
        if impl in ("pallas", "pallas_sharded"):
            from mmvqa_tpu.ops.activations import FAST_SERF_BF16
            from mmvqa_tpu.ops.pallas_token_head import (
                fused_token_head,
                fused_token_head_sharded,
            )

            kern_act = act_name
            if (act_name == "serf" and FAST_SERF_BF16
                    and self.dtype == jnp.bfloat16):
                kern_act = "serf_fast"  # match the bf16 conv-path numerics
            wk = w[0, 0].astype(self.dtype)
            if impl == "pallas_sharded":
                from mmvqa_tpu.core import mesh as mesh_module

                return fused_token_head_sharded(
                    x, wk, kern_act, mesh_module.CURRENT.mesh)
            return fused_token_head(x, wk, kern_act)
        from mmvqa_tpu.ops.pallas_token_head import token_head_reference

        return token_head_reference(x, w[0, 0].astype(self.dtype), act_name)

    @nn.compact
    def __call__(
        self, img: jax.Array, train: bool = False, perturb=None
    ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
        """img: (B, H, W, 3) NHWC. Returns (tokens, stage_features).

        ``stage_features`` exposes the raw tapped maps so Grad-CAM can take
        gradients w.r.t. the deepest map without forward hooks
        (image_encoding.py:109-128 equivalent, done functionally):
        ``perturb`` is a zero array ADDED to the deepest tapped feature —
        differentiating the logit w.r.t. it yields exactly d logit / d map.
        """
        if "resnet" in self.cnn_encoder:
            if self.num_vis != 5:
                raise ValueError("resnet152 supports num_vis=5 only")
            stages = (1, 1, 1, 1) if self.tiny else (3, 8, 36, 3)
            stem, c256, c512, c1024, c2048 = ResNetFeatures(
                stage_sizes=stages, dtype=self.dtype, name="trunk"
            )(img, train)
            feats = (c2048, c1024, c512, c256, stem)  # deepest-first
            if perturb is not None:
                feats = (feats[0] + perturb,) + feats[1:]
            tokens = tuple(self._token(f, i) for i, f in enumerate(feats))
            return tokens, feats
        elif "efficientnetv2" in self.cnn_encoder:
            kw = {"arch": TINY_EFFNET_ARCH} if self.tiny else {}
            all_stages = EffNetV2Features(dtype=self.dtype, name="trunk", **kw)(
                img, train
            )
            if self.num_vis == 5:
                feats = tuple(all_stages[i] for i in FIVE_TAP_STAGES)
                if perturb is not None:
                    feats = feats[:-1] + (feats[-1] + perturb,)
                tokens = tuple(self._token(f, i) for i, f in enumerate(feats))
            elif self.num_vis == 7:
                feats = all_stages
                if perturb is not None:
                    feats = feats[:-1] + (feats[-1] + perturb,)
                tokens = tuple(
                    self._token(f, i, always_serf=True)
                    for i, f in enumerate(feats)
                )
            else:
                raise ValueError("efficientnetv2 supports num_vis in {5, 7}")
            return tokens, feats
        raise NotImplementedError(self.cnn_encoder)
