"""Eval/train criterion matrix for the VQA step (VERDICT r3 items 1+6).

The reference's validate/test pass val/test logits through the SAME
criterion object as training (vqamed2019/utils.py:690-711 — ``loss =
criterion(logits, target)`` after ``criterion.eval()``):

- CrossEntropyLoss has no train/eval branch -> CE at eval.
- ASLSingleLabel has no train/eval branch (asl_singlelabel.py:23-53)
  -> the monitored val/test loss IS the ASL loss.
- LabelSmoothing (utils.py:196-200) and LabelSmoothByCategory
  (utils.py:1261-1264) branch on ``self.training`` -> plain CE at eval.

These tests pin every (--loss, --smoothing) combination's train_step AND
eval_step loss against a torch restatement of the reference criteria,
using a stub logit model so the comparison is exact (the full-model
trajectory parity lives in test_trajectory_parity.py). A driver-level
wiring test then certifies that ReduceLROnPlateau and the best-val-loss
checkpoint consume exactly that eval loss (train.py:229-268).
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import flax.linen as nn

from mmvqa_tpu.core.config import vqa_config
from mmvqa_tpu.data.images import AugmentSpec
from mmvqa_tpu.train.state import create_train_state
from mmvqa_tpu.train.steps import make_vqa_steps

B, S, NUM_CLASSES, T = 8, 16, 11, 12

NOOP_AUG = AugmentSpec(
    crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0), rotation_deg=0.0,
    brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0,
)


class _LogitModel(nn.Module):
    """Stub with MMBert's apply signature: logits are a fixed linear map of
    the normalized image's channel means, so the torch side can reproduce
    them exactly and the test isolates the CRITERION."""

    num_classes: int

    @nn.compact
    def __call__(self, img, ids, seg, mask, deterministic=True,
                 train_cnn=False):
        w = self.param(
            "w", nn.initializers.normal(1.0), (3, self.num_classes)
        )
        # dummy mutable stat so the shared train path (mutable=['batch_stats'])
        # round-trips
        cnt = self.variable("batch_stats", "count", lambda: jnp.zeros(()))
        if train_cnn:
            cnt.value = cnt.value + 1
        pooled = jnp.mean(img.astype(jnp.float32), axis=(1, 2))
        return pooled @ w


def _np_logits(batch, w):
    img = batch["image"].astype(np.float32) / 255.0
    img = (img - 0.5) / 0.5
    return img.mean(axis=(1, 2)) @ w


def _asl_torch(logits, target):
    """asl_singlelabel.py:23-53 restated (gamma_pos=0, gamma_neg=4,
    eps=0.1, reduction='mean')."""
    x = torch.as_tensor(logits, dtype=torch.float32)
    t = torch.as_tensor(target, dtype=torch.int64)
    num_classes = x.shape[-1]
    logp = torch.log_softmax(x, dim=-1)
    tc = torch.zeros_like(x).scatter_(1, t.unsqueeze(1), 1.0)
    anti = 1.0 - tc
    xs_pos = torch.exp(logp) * tc
    xs_neg = (1.0 - torch.exp(logp)) * anti
    w = torch.pow(1.0 - xs_pos - xs_neg, 0.0 * tc + 4.0 * anti)
    logp = logp * w
    tc = tc * (1.0 - 0.1) + 0.1 / num_classes
    return float((-tc * logp).sum(-1).mean())


def _ce_torch(logits, target):
    return float(F.cross_entropy(
        torch.as_tensor(logits, dtype=torch.float32),
        torch.as_tensor(target, dtype=torch.int64),
    ))


def _smooth_by_category_torch(logits, target, category, table, smoothing):
    """LabelSmoothByCategory train branch (utils.py:1247-1256,1297-1300):
    per-sample category smoothing vector, answer slot overwritten with the
    confidence, mean over batch of sum(-soft * log_softmax)."""
    x = torch.as_tensor(logits, dtype=torch.float32)
    soft = torch.as_tensor(table[category], dtype=torch.float32).clone()
    for i, t in enumerate(target):
        soft[i, t] = 1.0 - smoothing
    logp = torch.log_softmax(x, dim=1)
    return float((-soft * logp).sum(1).mean())


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        "tokens": rng.integers(0, 50, (B, T)).astype(np.int32),
        "segment_ids": np.zeros((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "answer": rng.integers(0, NUM_CLASSES, (B,)).astype(np.int32),
        "category": rng.integers(0, 5, (B,)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }
    # arbitrary valid smoothing table: rows sum to smoothing, with zeros
    smoothing = 0.1
    table = np.zeros((5, NUM_CLASSES), np.float32)
    for c in range(5):
        cols = rng.choice(NUM_CLASSES, size=3 + c % 3, replace=False)
        table[c, cols] = smoothing / len(cols)
    return batch, table, smoothing


CASES = [
    ("CrossEntropyLoss", False),
    ("ASLSingleLabel", False),
    ("CrossEntropyLoss", True),   # --smoothing takes precedence (train.py:163)
    ("ASLSingleLabel", True),     # smoothing still wins even with --loss ASL
]


@pytest.mark.parametrize("loss,use_smoothing", CASES)
def test_criterion_matrix_matches_torch_restatement(setup, loss, use_smoothing):
    batch, table, smoothing = setup
    cfg = vqa_config(
        cnn_encoder="resnet152", transformer_model="transformer",
        tiny_cnn=True, hidden_size=16, n_layers=1, vocab_size=50,
        num_classes=NUM_CLASSES, max_position_embeddings=T, image_size=S,
        batch_size=B, lr=1e-3, loss=loss,
        smoothing=smoothing if use_smoothing else None,
    )
    model = _LogitModel(NUM_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((B, S, S, 3)),
        jnp.asarray(batch["tokens"]), jnp.asarray(batch["segment_ids"]),
        jnp.asarray(batch["input_mask"]),
    )
    state = create_train_state(variables, cfg.lr)
    train_step, eval_step = make_vqa_steps(
        model, cfg, aug=NOOP_AUG,
        category_smoothing_table=table if use_smoothing else None,
    )
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    w = np.asarray(variables["params"]["w"])
    em = eval_step(state, jb)
    _, tm = train_step(state, jb, jax.random.PRNGKey(2))  # donates state

    logits = _np_logits(batch, w)

    # train-time criterion (train.py:163-173 selection order)
    if use_smoothing:
        want_train = _smooth_by_category_torch(
            logits, batch["answer"], batch["category"], table, smoothing
        )
    elif loss == "ASLSingleLabel":
        want_train = _asl_torch(logits, batch["answer"])
    else:
        want_train = _ce_torch(logits, batch["answer"])

    # eval-time criterion: same object; only the smoothing losses branch to
    # CE in eval mode (utils.py:196-200, 1261-1264); ASL has no eval branch
    if use_smoothing or loss == "CrossEntropyLoss":
        want_eval = _ce_torch(logits, batch["answer"])
    else:
        want_eval = _asl_torch(logits, batch["answer"])

    np.testing.assert_allclose(float(tm["loss"]), want_train, rtol=1e-5)
    np.testing.assert_allclose(float(em["loss"]), want_eval, rtol=1e-5)


def test_asl_eval_loss_is_not_ce(setup):
    """Regression pin for the r3 bug: under --loss ASLSingleLabel the
    eval loss must be the ASL loss, which differs from plain CE."""
    batch, _, _ = setup
    cfg = vqa_config(
        cnn_encoder="resnet152", transformer_model="transformer",
        tiny_cnn=True, hidden_size=16, n_layers=1, vocab_size=50,
        num_classes=NUM_CLASSES, max_position_embeddings=T, image_size=S,
        batch_size=B, lr=1e-3, loss="ASLSingleLabel",
    )
    model = _LogitModel(NUM_CLASSES)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((B, S, S, 3)),
        jnp.asarray(batch["tokens"]), jnp.asarray(batch["segment_ids"]),
        jnp.asarray(batch["input_mask"]),
    )
    state = create_train_state(variables, cfg.lr)
    _, eval_step = make_vqa_steps(model, cfg, aug=NOOP_AUG)
    em = eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    w = np.asarray(variables["params"]["w"])
    logits = _np_logits(batch, w)
    ce = _ce_torch(logits, batch["answer"])
    asl = _asl_torch(logits, batch["answer"])
    assert abs(ce - asl) > 1e-4, "degenerate fixture: CE == ASL"
    np.testing.assert_allclose(float(em["loss"]), asl, rtol=1e-5)
    assert abs(float(em["loss"]) - ce) > 1e-4


def test_plateau_and_best_loss_consume_asl_val_loss(tmp_path, monkeypatch):
    """Driver wiring (train.py:229-268 semantics): under --loss
    ASLSingleLabel, the value fed to ReduceLROnPlateau.step and compared
    for the best-val-loss checkpoint is exactly the eval_step loss — which
    the matrix test above certifies is the ASL loss."""
    import mmvqa_tpu.cli.vqa_train as vqa_train_mod
    from mmvqa_tpu.cli import make_fixtures
    from mmvqa_tpu.train import ReduceLROnPlateau, trainer

    fx = str(tmp_path / "fixture")
    make_fixtures.main(["--out", fx, "--image_size", "32",
                        "--n_train", "8", "--n_val", "8", "--n_per_cat", "4"])

    sched_inputs = []
    orig_step = ReduceLROnPlateau.step

    def spy_step(self, value):
        sched_inputs.append(float(value))
        return orig_step(self, value)

    monkeypatch.setattr(ReduceLROnPlateau, "step", spy_step)

    epoch_metrics = []
    orig_epoch = trainer.vqa_epoch

    def spy_epoch(*a, **kw):
        state, m = orig_epoch(*a, **kw)
        epoch_metrics.append(m)
        return state, m

    monkeypatch.setattr(vqa_train_mod, "vqa_epoch", spy_epoch)

    saved = []
    orig_save = vqa_train_mod.checkpoint.save_weights
    monkeypatch.setattr(
        vqa_train_mod.checkpoint, "save_weights",
        lambda path, state: saved.append(path) or None,
    )
    del orig_save

    save = str(tmp_path / "out")
    vqa_train_mod.main([
        "--data_dir", os.path.join(fx, "vqa"),
        "--save_dir", save, "--run_name", "aslwire",
        "--loss", "ASLSingleLabel", "--num_vis", "5",
        "--transformer_model", "transformer",
        "--cnn_encoder", "resnet152", "--tiny_cnn",
        "--batch_size", "8", "--epochs", "2", "--num_workers", "0",
        "--hidden_size", "32", "--n_layers", "1", "--heads", "4",
        "--image_size", "32", "--max_position_embeddings", "16",
        "--steps_per_call", "1",
    ])

    # per epoch: train, val, test epochs -> metrics[3k+1] is the val sweep
    assert len(sched_inputs) == 2
    val_losses = [m["loss"] for m in epoch_metrics[1::3]]
    np.testing.assert_allclose(sched_inputs, val_losses, rtol=1e-6)
    # best-loss checkpoint written on epoch 1 (inf -> first val loss)
    assert any(p.endswith("aslwire_loss") for p in saved)
