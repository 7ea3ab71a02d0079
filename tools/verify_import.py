"""Pretrained-weight import verification: per-stage activation diffs.

CLAUDE.md roadmap #2 / VERDICT r3 item 8: the first thing to check when
real pretrained checkpoints land is that the torch->Flax conversion
(mmvqa_tpu/models/import_torch.py) reproduces the torch backbone's
ACTIVATIONS stage by stage — the oracle-circularity risk is that the test
restatements and the Flax port share a wrong assumption (TF-SAME padding,
BN eps, SE conventions), which only a real forward comparison can surface.

Given a torch state_dict (timm tf_efficientnetv2_m / torchvision resnet152
/ HF bert), this tool:

1. converts it into Flax params/batch_stats;
2. builds a torch-side oracle — the REAL library model when timm /
   torchvision / transformers is importable (the strongest check), else
   the test-suite restatement (tests/test_import_torch.py — still catches
   key-mapping/layout bugs on real weight values);
3. runs both on the same random input in eval mode and reports per-stage
   max-abs/rel activation diffs;
4. exits nonzero when any stage exceeds tolerance.

Usage (standalone, or via tools/parity_run.py --verify_import):
  python tools/verify_import.py --cnn_encoder tf_efficientnetv2_m \
      --cnn_checkpoint effv2m.pth [--bert_checkpoint bert.pth] \
      [--image_size 224] [--out report.json]

Reference basis: image_encoding.py:22-26 (timm pretrained=True),
mmbert.py:52-56 (HF bert-base-uncased embeddings).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))  # torch oracle restatements

ATOL = 2e-4  # fp32 single-forward accumulation noise at 224px full depth
RTOL = 2e-3


def _torch_effnet_taps(sd, x_nchw, arch):
    """Torch-side 7-stage feature maps: real timm if importable, else the
    test restatement (Conv2dSame padding, SiLU, SE conventions)."""
    import torch

    try:
        import timm  # noqa: F401

        if arch is not None:
            raise ImportError("tiny arch: timm model shape mismatch")
        model = timm.create_model(
            "tf_efficientnetv2_m", features_only=True, pretrained=False,
        )
        model.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False
        )
        oracle = "timm"
    except ImportError:
        from test_import_torch import TorchMiniEffNet

        from mmvqa_tpu.models.effnetv2 import V2_M_ARCH

        model = TorchMiniEffNet(arch if arch is not None else V2_M_ARCH)
        model.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}
        )
        oracle = "restatement"
    model.eval()
    with torch.no_grad():
        taps = model(torch.from_numpy(x_nchw))
    # timm features_only taps the 5 reduction boundaries = our stages
    # (0,1,2,4,6) (image_encoding.py:15 channel list [24,48,80,176,512]);
    # the restatement returns all 7 stage ends
    sel = (0, 1, 2, 4, 6) if oracle == "timm" else tuple(range(len(taps)))
    return [t.numpy() for t in taps], oracle, sel


def _torch_resnet_taps(sd, x_nchw, stage_sizes):
    import torch

    try:
        import torchvision

        if stage_sizes != (3, 8, 36, 3):
            raise ImportError("tiny arch: torchvision shape mismatch")
        net = torchvision.models.resnet152()
        net.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
        net.eval()
        feats = []
        with torch.no_grad():
            h = net.relu(net.bn1(net.conv1(torch.from_numpy(x_nchw))))
            feats.append(h)
            h = net.maxpool(h)
            for layer in (net.layer1, net.layer2, net.layer3, net.layer4):
                h = layer(h)
                feats.append(h)
        return ([f.numpy() for f in feats], "torchvision",
                tuple(range(len(feats))))
    except ImportError:
        from test_import_torch import TorchMiniResNet

        net = TorchMiniResNet(stage_sizes)
        net.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
        net.eval()
        with torch.no_grad():
            taps = net(torch.from_numpy(x_nchw))
        return ([t.numpy() for t in taps], "restatement",
                tuple(range(len(taps))))


def verify_cnn(cnn_encoder: str, checkpoint: str, image_size: int = 224,
               tiny: bool = False, seed: int = 0) -> dict:
    """Per-stage activation diff for one CNN checkpoint. Returns a report
    dict with per-stage max-abs/rel diffs and pass/fail."""
    import jax

    # activation-diff tolerances assume true fp32 convs/matmuls — on TPU
    # the default precision runs bf16 passes (3e-3-level activation error,
    # which would mask or fake a conversion bug)
    jax.config.update("jax_default_matmul_precision", "highest")

    from mmvqa_tpu.models.import_torch import (
        convert_effnetv2_m,
        convert_resnet152,
        load_state_dict,
    )

    sd = load_state_dict(checkpoint)
    if cnn_encoder == "auto":
        cnn_encoder = ("resnet152" if any(k.startswith("layer1.")
                                          for k in sd)
                       else "tf_efficientnetv2_m")
    rng = np.random.default_rng(seed)
    x = rng.normal(scale=0.5, size=(2, image_size, image_size, 3)).astype(
        np.float32
    )
    x_nchw = np.transpose(x, (0, 3, 1, 2)).copy()

    if "resnet" in cnn_encoder:
        from mmvqa_tpu.models.resnet import ResNetFeatures

        stage_sizes = (1, 1, 1, 1) if tiny else (3, 8, 36, 3)
        params, stats = convert_resnet152(sd, stage_sizes=stage_sizes)
        model = ResNetFeatures(stage_sizes=stage_sizes)
        want, oracle, sel = _torch_resnet_taps(sd, x_nchw, stage_sizes)
    else:
        from mmvqa_tpu.models.effnetv2 import EffNetV2Features

        arch = None
        if tiny:
            from test_import_torch import TINY_ARCH

            arch = TINY_ARCH
        params, stats = convert_effnetv2_m(
            sd, **({"arch": arch} if arch is not None else {})
        )
        model = EffNetV2Features(**({"arch": arch} if arch else {}))
        want, oracle, sel = _torch_effnet_taps(sd, x_nchw, arch)

    import jax

    got_all = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {"params": params, "batch_stats": stats}, x
    )
    got = [got_all[i] for i in sel]
    stages = []
    ok = True
    for i, (w, g) in enumerate(zip(want, got)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))  # NHWC -> NCHW
        if w.shape != g.shape:
            stages.append({"stage": sel[i], "error":
                           f"shape {g.shape} != torch {w.shape}"})
            ok = False
            continue
        ad = float(np.max(np.abs(w - g)))
        scale = float(np.max(np.abs(w))) or 1.0
        stage_ok = ad <= ATOL + RTOL * scale
        ok = ok and stage_ok
        stages.append({"stage": sel[i], "max_abs_diff": ad,
                       "max_abs_activation": scale, "ok": stage_ok})
    return {"what": f"cnn:{cnn_encoder}", "oracle": oracle,
            "checkpoint": checkpoint, "stages": stages, "ok": ok}


def verify_bert(checkpoint: str, vocab_size: int = 30522,
                hidden: int = 768, seed: int = 0) -> dict:
    """Embedding-table import diff (word+pos+type + LayerNorm) against the
    HF transformers BertEmbeddings module — transformers is the REAL
    library here, so this leg is never oracle-circular."""
    import jax
    import torch

    jax.config.update("jax_default_matmul_precision", "highest")

    from mmvqa_tpu.models.import_torch import (
        convert_bert_embeddings,
        load_state_dict,
    )

    sd = load_state_dict(checkpoint)
    emb_keys = {k: v for k, v in sd.items() if k.startswith("embeddings.")}
    converted = convert_bert_embeddings(sd)

    try:
        from transformers.models.bert.configuration_bert import BertConfig
        from transformers.models.bert.modeling_bert import BertEmbeddings

        vocab = emb_keys["embeddings.word_embeddings.weight"].shape[0]
        hid = emb_keys["embeddings.word_embeddings.weight"].shape[1]
        max_pos = emb_keys["embeddings.position_embeddings.weight"].shape[0]
        bconf = BertConfig(vocab_size=vocab, hidden_size=hid,
                           max_position_embeddings=max_pos)
        emb = BertEmbeddings(bconf)
        emb.load_state_dict(
            {k[len("embeddings."):]: torch.as_tensor(v)
             for k, v in emb_keys.items()}, strict=False)
        emb.eval()
        oracle = "transformers"
    except ImportError:
        from test_import_torch import TorchBertEmbeddings

        vocab = emb_keys["embeddings.word_embeddings.weight"].shape[0]
        hid = emb_keys["embeddings.word_embeddings.weight"].shape[1]
        emb = TorchBertEmbeddings(vocab=vocab, hidden=hid)
        emb.load_state_dict(
            {"embeddings." + k[len("embeddings."):]: torch.as_tensor(v)
             for k, v in emb_keys.items()}, strict=False)
        emb.eval()
        oracle = "restatement"

    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, (2, 16))
    seg = rng.integers(0, 2, (2, 16))
    with torch.no_grad():
        want = emb(torch.from_numpy(ids).long(),
                   token_type_ids=torch.from_numpy(seg).long()).numpy()

    import jax.numpy as jnp

    from mmvqa_tpu.models.embeddings import BertEmbeddings

    max_pos = emb_keys["embeddings.position_embeddings.weight"].shape[0]
    mod = BertEmbeddings(vocab_size=vocab, hidden_size=hid,
                         max_position_embeddings=max_pos,
                         type_vocab_size=2, dropout_rate=0.0)
    got = np.asarray(mod.apply(
        {"params": converted}, jnp.asarray(ids), jnp.asarray(seg),
        deterministic=True,
    ))
    ad = float(np.max(np.abs(want - got)))
    scale = float(np.max(np.abs(want))) or 1.0
    ok = ad <= ATOL + RTOL * scale
    return {"what": "bert_embeddings", "oracle": oracle,
            "checkpoint": checkpoint, "max_abs_diff": ad,
            "max_abs_activation": scale, "ok": ok}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cnn_encoder", default="tf_efficientnetv2_m")
    ap.add_argument("--cnn_checkpoint", default="")
    ap.add_argument("--bert_checkpoint", default="")
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--tiny", action="store_true", default=False,
                    help="tiny-arch state_dict (CI smoke)")
    ap.add_argument("--out", default="",
                    help="write the JSON report here")
    args = ap.parse_args(argv)

    reports = []
    if args.cnn_checkpoint:
        reports.append(verify_cnn(args.cnn_encoder, args.cnn_checkpoint,
                                  args.image_size, tiny=args.tiny))
    if args.bert_checkpoint:
        reports.append(verify_bert(args.bert_checkpoint))
    if not reports:
        print("nothing to verify: pass --cnn_checkpoint/--bert_checkpoint")
        return 2

    ok = all(r["ok"] for r in reports)
    for r in reports:
        print(f"[verify_import] {r['what']} (oracle={r['oracle']}): "
              f"{'OK' if r['ok'] else 'MISMATCH'}")
        for s in r.get("stages", []):
            print(f"  stage {s['stage']}: " + (
                s["error"] if "error" in s else
                f"max|diff| {s['max_abs_diff']:.3e} "
                f"(max|act| {s['max_abs_activation']:.3e}) "
                f"{'ok' if s['ok'] else 'FAIL'}"))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(reports, f, indent=2)
        print(f"[verify_import] report -> {args.out}")
    print(f"[verify_import] {'ALL OK' if ok else 'MISMATCH DETECTED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
