"""Weight-import parity: torch oracles with torchvision/timm layer naming and
semantics -> convert -> Flax models must produce the same outputs.

This simultaneously validates the state_dict key mapping AND architectural
parity of the CNN ports (explicit/SAME padding, BN eps, stage taps,
depthwise conv layout, SE wiring).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mmvqa_tpu.models.effnetv2 import EffNetV2Features
from mmvqa_tpu.models.embeddings import BertEmbeddings
from mmvqa_tpu.models.import_torch import (
    convert_bert_embeddings,
    convert_effnetv2_m,
    convert_resnet152,
)
from mmvqa_tpu.models.resnet import ResNetFeatures

torch.manual_seed(0)


def _randomize_bn(m: nn.Module):
    """Give BN layers non-trivial running stats so eval-mode parity is a
    real test."""
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5)
            mod.running_var.uniform_(0.5, 1.5)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.uniform_(-0.5, 0.5)


# ---------------------------------------------------------------------------
# ResNet oracle (torchvision naming/semantics)
# ---------------------------------------------------------------------------

class TorchBottleneck(nn.Module):
    def __init__(self, in_ch, width, stride, downsample):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(out + idt)


class TorchMiniResNet(nn.Module):
    def __init__(self, stage_sizes=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        in_ch = 64
        for si, (n, w) in enumerate(zip(stage_sizes, (64, 128, 256, 512))):
            blocks = []
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                ds = None
                if bi == 0:
                    ds = nn.Sequential(
                        nn.Conv2d(in_ch, w * 4, 1, stride, bias=False),
                        nn.BatchNorm2d(w * 4),
                    )
                blocks.append(TorchBottleneck(in_ch, w, stride, ds))
                in_ch = w * 4
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        stem = F.relu(self.bn1(self.conv1(x)))
        h = F.max_pool2d(stem, 3, 2, 1)
        taps = [stem]
        for si in range(4):
            h = getattr(self, f"layer{si + 1}")(h)
            taps.append(h)
        return taps


def test_resnet_import_parity(rng):
    stages = (1, 1, 1, 1)
    tm = TorchMiniResNet(stages).eval()
    _randomize_bn(tm)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tm(torch.from_numpy(x))]

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet152(sd, stage_sizes=stages)
    model = ResNetFeatures(stage_sizes=stages)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w, rtol=2e-4, atol=2e-4
        )


# ---------------------------------------------------------------------------
# EfficientNetV2 oracle (timm naming/semantics, TF SAME padding, bn eps 1e-3)
# ---------------------------------------------------------------------------

def _pad_same(x, k, s):
    ih, iw = x.shape[-2:]
    pad_h = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pad_w = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(
        x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2]
    )


class Conv2dSame(nn.Conv2d):
    def forward(self, x):
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation,
            self.groups,
        )


def _bn2d(c):
    return nn.BatchNorm2d(c, eps=1e-3)


class TorchConvBnAct(nn.Module):  # fused e1 (timm 'cn' block)
    def __init__(self, in_ch, out_ch, k, s):
        super().__init__()
        self.conv = Conv2dSame(in_ch, out_ch, k, s, bias=False)
        self.bn1 = _bn2d(out_ch)
        self.has_skip = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = F.silu(self.bn1(self.conv(x)))
        return h + x if self.has_skip else h


class TorchEdgeResidual(nn.Module):  # FusedMBConv e>1 (timm 'er' block)
    def __init__(self, in_ch, out_ch, k, s, e):
        super().__init__()
        mid = in_ch * e
        self.conv_exp = Conv2dSame(in_ch, mid, k, s, bias=False)
        self.bn1 = _bn2d(mid)
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn2 = _bn2d(out_ch)
        self.has_skip = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_exp(x)))
        h = self.bn2(self.conv_pwl(h))
        return h + x if self.has_skip else h


class TorchSE(nn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(ch, rd, 1)
        self.conv_expand = nn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class TorchInvertedResidual(nn.Module):  # MBConv (timm 'ir' block)
    def __init__(self, in_ch, out_ch, k, s, e, se_ratio):
        super().__init__()
        mid = in_ch * e
        self.conv_pw = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = _bn2d(mid)
        self.conv_dw = Conv2dSame(mid, mid, k, s, groups=mid, bias=False)
        self.bn2 = _bn2d(mid)
        self.se = TorchSE(mid, max(1, int(in_ch * se_ratio)))
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = _bn2d(out_ch)
        self.has_skip = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = F.silu(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.has_skip else h


TINY_ARCH = (
    ("fused", 1, 3, 1, 1, 24, 0.0),
    ("fused", 1, 3, 2, 4, 48, 0.0),
    ("fused", 1, 3, 2, 4, 80, 0.0),
    ("mb", 1, 3, 2, 4, 160, 0.25),
    ("mb", 1, 3, 1, 6, 176, 0.25),
    ("mb", 1, 3, 2, 6, 304, 0.25),
    ("mb", 1, 3, 1, 6, 512, 0.25),
)


class TorchMiniEffNet(nn.Module):
    def __init__(self, arch=TINY_ARCH, stem=24):
        super().__init__()
        self.conv_stem = Conv2dSame(3, stem, 3, 2, bias=False)
        self.bn1 = _bn2d(stem)
        blocks = []
        in_ch = stem
        for (btype, reps, k, s, e, c, se) in arch:
            stage = []
            for bi in range(reps):
                stride = s if bi == 0 else 1
                if btype == "fused" and e == 1:
                    stage.append(TorchConvBnAct(in_ch, c, k, stride))
                elif btype == "fused":
                    stage.append(TorchEdgeResidual(in_ch, c, k, stride, e))
                else:
                    stage.append(
                        TorchInvertedResidual(in_ch, c, k, stride, e, se)
                    )
                in_ch = c
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_stem(x)))
        taps = []
        for stage in self.blocks:
            h = stage(h)
            taps.append(h)
        return taps


def test_effnetv2_import_parity(rng):
    tm = TorchMiniEffNet().eval()
    _randomize_bn(tm)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tm(torch.from_numpy(x))]

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_effnetv2_m(sd, arch=TINY_ARCH)
    model = EffNetV2Features(arch=TINY_ARCH)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w, rtol=2e-4, atol=2e-4,
            err_msg=f"stage {i}",
        )


# ---------------------------------------------------------------------------
# BERT embeddings oracle (HF naming/semantics)
# ---------------------------------------------------------------------------

class TorchBertEmbeddings(nn.Module):
    def __init__(self, vocab=100, hidden=32, max_pos=24, types=2):
        super().__init__()
        self.word_embeddings = nn.Embedding(vocab, hidden)
        self.position_embeddings = nn.Embedding(max_pos, hidden)
        self.token_type_embeddings = nn.Embedding(types, hidden)
        self.LayerNorm = nn.LayerNorm(hidden, eps=1e-12)

    def forward(self, ids, type_ids):
        pos = torch.arange(ids.shape[1])[None]
        x = (
            self.word_embeddings(ids)
            + self.position_embeddings(pos)
            + self.token_type_embeddings(type_ids)
        )
        return self.LayerNorm(x)


def test_bert_embeddings_import_parity(rng):
    tm = TorchBertEmbeddings().eval()
    ids = rng.integers(0, 100, (2, 24))
    types = rng.integers(0, 2, (2, 24))
    with torch.no_grad():
        want = tm(torch.from_numpy(ids), torch.from_numpy(types)).numpy()

    sd = {
        "embeddings." + k: v.numpy() for k, v in tm.state_dict().items()
    }
    params = convert_bert_embeddings(sd)
    model = BertEmbeddings(
        vocab_size=100, hidden_size=32, max_position_embeddings=24,
        type_vocab_size=2,
    )
    got = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(types),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
