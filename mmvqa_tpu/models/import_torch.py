"""Pretrained-weight import: torch state_dicts -> Flax parameter trees.

The reference uses torchvision's resnet152(pretrained=True), timm's
tf_efficientnetv2_m(pretrained=True) (image_encoding.py:22-26) and HF
bert-base-uncased embeddings (mmbert.py:52-56). This environment has no
network access, so import works from a user-supplied checkpoint file
(``torch.save``d state_dict, or a ``.npz`` with the same keys). Key naming
conventions:

* torchvision resnet: conv1/bn1, layer{1..4}.{i}.conv{1..3}/bn{1..3},
  layer{s}.0.downsample.{0,1};
* timm tf_efficientnetv2_m: conv_stem/bn1, blocks.{s}.{i}. with conv/bn1
  (ConvBnAct), conv_exp/bn1 + conv_pwl/bn2 (EdgeResidual a.k.a. FusedMBConv),
  conv_pw/bn1 + conv_dw/bn2 + se.conv_reduce/se.conv_expand + conv_pwl/bn3
  (InvertedResidual);
* HF bert: embeddings.word_embeddings/position_embeddings/
  token_type_embeddings/LayerNorm.

Conversions: conv kernels OIHW -> HWIO (depthwise: OIHW O=C,I=1 -> HWIO
with I=1 mapped to feature_group layout), linear kernels transpose, BN
running stats -> batch_stats.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dwconv(w: np.ndarray) -> np.ndarray:
    """torch depthwise OIHW (O=C, I=1) -> flax HWIO with feature_group_count=C
    (flax expects I = in_ch/groups = 1, O = C)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def _bn(sd: Mapping[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_resnet152(
    sd: Mapping[str, np.ndarray], stage_sizes=(3, 8, 36, 3)
) -> Tuple[Dict, Dict]:
    """torchvision resnet state_dict -> (params, batch_stats) for
    mmvqa_tpu.models.resnet.ResNetFeatures."""
    params: Dict = {"conv1": {"kernel": _conv(sd["conv1.weight"])}}
    stats: Dict = {}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s
    for si, n_blocks in enumerate(stage_sizes):
        for bi in range(n_blocks):
            t = f"layer{si + 1}.{bi}"
            name = f"layer{si + 1}_block{bi}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for ci in (1, 2, 3):
                blk_p[f"conv{ci}"] = {
                    "kernel": _conv(sd[f"{t}.conv{ci}.weight"])
                }
                bp, bs = _bn(sd, f"{t}.bn{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = bp, bs
            if f"{t}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])
                }
                bp, bs = _bn(sd, f"{t}.downsample.1")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bp, bs
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


def convert_effnetv2_m(
    sd: Mapping[str, np.ndarray],
    arch=None,
) -> Tuple[Dict, Dict]:
    """timm tf_efficientnetv2_m state_dict -> (params, batch_stats) for
    mmvqa_tpu.models.effnetv2.EffNetV2Features."""
    from mmvqa_tpu.models.effnetv2 import V2_M_ARCH

    arch = arch or V2_M_ARCH
    params: Dict = {"stem_conv": {"kernel": _conv(sd["conv_stem.weight"])}}
    stats: Dict = {}
    p, s = _bn(sd, "bn1")
    params["stem_bn"], stats["stem_bn"] = p, s
    for si, (btype, reps, k, st, e, c, se) in enumerate(arch):
        for bi in range(reps):
            t = f"blocks.{si}.{bi}"
            name = f"stage{si}_block{bi}"
            bp: Dict = {}
            bs: Dict = {}
            if btype == "fused":
                if e == 1:  # timm ConvBnAct
                    bp["conv"] = {"kernel": _conv(sd[f"{t}.conv.weight"])}
                    q, r = _bn(sd, f"{t}.bn1")
                    bp["bn1"], bs["bn1"] = q, r
                else:  # timm EdgeResidual
                    bp["conv_exp"] = {
                        "kernel": _conv(sd[f"{t}.conv_exp.weight"])
                    }
                    q, r = _bn(sd, f"{t}.bn1")
                    bp["bn1"], bs["bn1"] = q, r
                    bp["pw_proj"] = {
                        "kernel": _conv(sd[f"{t}.conv_pwl.weight"])
                    }
                    q, r = _bn(sd, f"{t}.bn2")
                    bp["bn2"], bs["bn2"] = q, r
            else:  # timm InvertedResidual
                bp["pw_exp"] = {"kernel": _conv(sd[f"{t}.conv_pw.weight"])}
                q, r = _bn(sd, f"{t}.bn1")
                bp["bn1"], bs["bn1"] = q, r
                bp["dw"] = {"kernel": _dwconv(sd[f"{t}.conv_dw.weight"])}
                q, r = _bn(sd, f"{t}.bn2")
                bp["bn2"], bs["bn2"] = q, r
                if se > 0:
                    bp["se"] = {
                        "reduce": {
                            "kernel": _conv(sd[f"{t}.se.conv_reduce.weight"]),
                            "bias": np.asarray(sd[f"{t}.se.conv_reduce.bias"]),
                        },
                        "expand": {
                            "kernel": _conv(sd[f"{t}.se.conv_expand.weight"]),
                            "bias": np.asarray(sd[f"{t}.se.conv_expand.bias"]),
                        },
                    }
                bp["pw_proj"] = {"kernel": _conv(sd[f"{t}.conv_pwl.weight"])}
                q, r = _bn(sd, f"{t}.bn3")
                bp["bn3"], bs["bn3"] = q, r
            params[name] = bp
            stats[name] = bs
    return params, stats


def convert_bert_embeddings(sd: Mapping[str, np.ndarray]) -> Dict:
    """HF bert state_dict (embeddings.* keys) -> BertEmbeddings params."""
    pre = "embeddings."
    if f"{pre}word_embeddings.weight" not in sd:
        pre = "bert.embeddings."
    return {
        "word_embeddings": {
            "embedding": np.asarray(sd[f"{pre}word_embeddings.weight"])
        },
        "position_embeddings": np.asarray(
            sd[f"{pre}position_embeddings.weight"]
        ),
        "token_type_embeddings": {
            "embedding": np.asarray(sd[f"{pre}token_type_embeddings.weight"])
        },
        "layer_norm": {
            "scale": np.asarray(sd[f"{pre}LayerNorm.weight"]),
            "bias": np.asarray(sd[f"{pre}LayerNorm.bias"]),
        },
    }


def import_backbone_into_variables(
    variables: Dict, cfg, checkpoint_path: str
) -> Dict:
    """Load a torch CNN checkpoint into an MMBert variables tree (the
    ``trans.trunk`` subtree). Returns a new variables dict."""
    sd = load_state_dict(checkpoint_path)
    if "resnet" in cfg.cnn_encoder:
        p, s = convert_resnet152(sd)
    else:
        p, s = convert_effnetv2_m(sd)
    import jax

    variables = jax.tree.map(lambda x: x, variables)  # shallow copy
    variables = dict(variables)
    params = dict(variables["params"])
    bstats = dict(variables.get("batch_stats", {}))
    trans = dict(params["trans"])
    trans["trunk"] = p
    params["trans"] = trans
    st = dict(bstats.get("trans", {}))
    st["trunk"] = s
    bstats["trans"] = st
    variables["params"] = params
    variables["batch_stats"] = bstats
    return variables
