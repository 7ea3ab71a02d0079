"""CLI flag-surface drift guard (VERDICT r3 item 7).

The four drivers' (flag, default, choices) sets are the compatibility
contract with the reference (BASELINE.json). These tables are PINNED
transcriptions of the reference argparse definitions:

- pretrain/roco_train.py:21-61
- pretrain/roco_supcon_train.py:25-74
- vqamed2019/train.py:30-81
- vqamed2019/eval.py:25-68

The test introspects our parsers (cli/common.py) and fails if (a) any
reference flag is missing or has a drifted default/choices, or (b) our
side grows a flag outside the documented additive set — so drift on
EITHER side breaks it.
"""

import argparse
import math

import pytest

from mmvqa_tpu.cli.common import pretrain_parser, vqa_parser

REQ = "REQUIRED"
INF = float("inf")

# reference pretrain/roco_train.py:21-61
REF_ROCO_TRAIN = {
    "run_name": REQ, "data_dir": "roco", "save_dir": "MMBERT/pretrain/save",
    "mlm_prob": REQ, "mixed_precision": False, "resume": False,
    "task": "MLM", "clinicalbert": "emilyalsentzer/Bio_ClinicalBERT",
    "max_token_length": 512, "batch_size": 16, "lr": 2e-5, "patience": 5,
    "factor": 0.1, "num_workers": 4, "epochs": 10, "train_pct": 1.0,
    "valid_pct": 1.0, "test_pct": 1.0, "max_position_embeddings": 75,
    "n_layers": 4, "heads": 12, "type_vocab_size": 2, "vocab_size": 30522,
    "hidden_size": 768, "hidden_dropout_prob": 0.3, "val_loss_resume": INF,
    "dataset": "roco", "cnn_encoder": "resnet152",
    "transformer_model": "transformer", "num_vis": 5, "use_relu": False,
}

# reference pretrain/roco_supcon_train.py:25-74 (required=True flags with
# dead defaults — con_task/similarity — stay REQUIRED)
REF_SUPCON = {
    **{k: v for k, v in REF_ROCO_TRAIN.items()},
    "resume_dir": "ImageClef-2019-VQA-Med/mmbert/MLM/model.pt",
    "no_recorder": False, "supcon": True, "con_task": REQ,
    "similarity": REQ, "bert_score": "bert",
}

# reference vqamed2019/train.py:30-81
REF_VQA_TRAIN = {
    "run_name": REQ, "data_dir": "ImageClef-2019-VQA-Med",
    "model_dir": "MMBERT/pretrain/val_loss_3.pt",
    "resume_dir": "ImageClef-2019-VQA-Med/mmbert/MLM/model.pt",
    "save_dir": "ImageClef-2019-VQA-Med/mmbert", "category": None,
    "use_pretrained": False, "resume_training": False,
    "mixed_precision": False, "clip": False, "seed": 42, "num_workers": 4,
    "epochs": 100, "train_pct": 1.0, "valid_pct": 1.0, "test_pct": 1.0,
    "max_position_embeddings": 28, "batch_size": 16, "lr": 1e-4,
    "factor": 0.1, "patience": 10, "counter": 20,
    "hidden_dropout_prob": 0.3, "smoothing": None, "image_size": 224,
    "hidden_size": 312, "vocab_size": 30522, "type_vocab_size": 2,
    "heads": 12, "n_layers": 4, "num_vis": REQ, "wandb": True,
    "save_model_epoch": 4, "task": "MLM",
    "clinicalbert": "emilyalsentzer/Bio_ClinicalBERT", "dataset": "VQA-Med",
    "cnn_encoder": "resnet152", "use_relu": False,
    "transformer_model": "transformer", "loss": "CrossEntropyLoss",
}

# reference vqamed2019/eval.py:25-68
REF_VQA_EVAL = {
    k: v for k, v in REF_VQA_TRAIN.items()
    if k not in ("resume_dir", "resume_training", "counter", "wandb",
                 "save_model_epoch", "loss")
}
REF_VQA_EVAL.update({
    "data_dir": "../ImageClef-2019-VQA-Med",
    "model_dir": "../ImageClef-2019-VQA-Med/mmbert/MLM/vqamed-roco-1_acc.pt",
    "save_dir": "../ImageClef-2019-VQA-Med/mmbert",
})

# documented default deviations (ours -> why)
DEFAULT_EXCEPTIONS = {
    # eval.py's "../"-relative path defaults assume running from
    # vqamed2019/; our drivers run from anywhere, so the eval parser
    # shares the train-side path defaults (PARITY.md)
    ("eval", "data_dir"): "ImageClef-2019-VQA-Med",
    ("eval", "model_dir"): "MMBERT/pretrain/val_loss_3.pt",
    ("eval", "save_dir"): "ImageClef-2019-VQA-Med/mmbert",
}

# reference choices worth pinning (flag -> choices)
REF_CHOICES = {
    "transformer_model": ("transformer", "realformer",
                          "feedback-transformer"),
    "loss": ("CrossEntropyLoss", "ASLSingleLabel"),
    "con_task": ("supcon", "simclr"),
    "similarity": ("jaccard", "cosine", "sentence_transformers",
                   "bert_score"),
    "bert_score": ("bert", "scibert"),
}

# our TPU-native additive surface (anything else new fails the test)
ALLOWED_ADDITIVE = {
    # add_tpu_flags (cli/common.py)
    "vocab_file", "dp_size", "tp_size", "cp_size", "fsdp", "cache_images",
    "image_cache_dir", "profile_dir", "debug_nans", "use_sim_mask",
    "cnn_checkpoint", "bert_checkpoint", "steps_per_call", "token_head",
    "tiny_cnn", "attention_impl", "grad_accum", "pp_size", "pp_microbatches",
    # observability additions (wandb.watch equivalents)
    "watch", "watch_histograms",
    # smoke-run image size for pretrain (reference hard-codes 224 in its
    # transforms); the vqa drivers have it in the reference already
    "image_size",
}

TASK_CHOICES = {
    "pre": ("MLM", "distillation"),
    "sup": ("MLM",),
    "vqa": ("MLM", "distillation"),
    "eval": ("MLM", "distillation"),
}


def surface(parser):
    out = {}
    for a in parser._actions:
        if isinstance(a, argparse._HelpAction):
            continue
        name = a.option_strings[-1].lstrip("-")
        default = REQ if a.required else a.default
        out[name] = (default, tuple(a.choices) if a.choices else None)
    return out


PARSERS = {
    "pre": (lambda: pretrain_parser(False), REF_ROCO_TRAIN),
    "sup": (lambda: pretrain_parser(True), REF_SUPCON),
    "vqa": (lambda: vqa_parser(False), REF_VQA_TRAIN),
    "eval": (lambda: vqa_parser(True), REF_VQA_EVAL),
}


@pytest.mark.parametrize("name", list(PARSERS))
def test_flag_surface_matches_reference(name):
    mk, ref = PARSERS[name]
    got = surface(mk())

    missing = [f for f in ref if f not in got]
    assert not missing, f"{name}: reference flags missing: {missing}"

    drifted = {}
    for flag, want in ref.items():
        want = DEFAULT_EXCEPTIONS.get((name, flag), want)
        have = got[flag][0]
        if isinstance(want, float) and math.isinf(want):
            ok = isinstance(have, float) and math.isinf(have)
        elif isinstance(want, float):
            ok = have == pytest.approx(want)
        else:
            ok = have == want
        if not ok:
            drifted[flag] = (have, want)
    assert not drifted, f"{name}: defaults drifted (got, want): {drifted}"

    extra = set(got) - set(ref) - ALLOWED_ADDITIVE
    assert not extra, f"{name}: undocumented additive flags: {extra}"


@pytest.mark.parametrize("name", list(PARSERS))
def test_flag_choices_match_reference(name):
    mk, ref = PARSERS[name]
    got = surface(mk())
    for flag, want in REF_CHOICES.items():
        if flag not in ref:
            continue
        assert got[flag][1] == want, (
            f"{name}: --{flag} choices {got[flag][1]} != reference {want}"
        )
    assert got["task"][1] == TASK_CHOICES[name]


def test_pretrain_run_name_keeps_short_alias():
    """roco_train.py:23 registers '-r, --run_name'."""
    p = pretrain_parser(False)
    act = next(a for a in p._actions if "--run_name" in a.option_strings)
    assert "-r" in act.option_strings
