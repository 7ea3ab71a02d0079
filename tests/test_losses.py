"""Golden-value loss/activation tests against a torch-CPU oracle.

The oracles re-state the reference formulas (cited per test) independently —
they are test fixtures, not ports. fp32 tolerance 1e-5.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mmvqa_tpu.ops import (
    asl_single_label,
    cross_entropy,
    gelu_erf,
    label_smoothing_loss,
    masked_mlm_nll,
    mse_distillation,
    serf,
    smoothed_soft_target_ce,
    supcon_loss,
)
from mmvqa_tpu.ops.losses import mlm_accuracy
from mmvqa_tpu.ops.supcon import split_two_views


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_serf_matches_reference_formula(rng):
    # models/serf.py:23-24: x * erf(log1p(exp(clamp(x, max=50))))
    x = rng.normal(size=(64, 32)).astype(np.float32) * 10
    x[0, 0] = 100.0  # overflow guard region
    x[0, 1] = -40.0
    want = t(x) * torch.erf(torch.log1p(torch.exp(torch.clamp(t(x), max=50))))
    got = serf(jnp.asarray(x))
    # XLA and torch fp32 exp/log1p/erf differ in the last few ulps
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=5e-4, atol=1e-5)


def test_fast_serf_bf16_below_bf16_resolution():
    """The bf16 fast path (sigmoid-gate polynomial, ops/activations.py) must
    stay within 1.2e-3 of exact SERF everywhere — ~7x under bf16's ulp at
    unit scale — and the f32 path must remain the exact formula."""
    from mmvqa_tpu.ops.activations import _serf_fast

    z = np.linspace(-40.0, 40.0, 200001).astype(np.float32)
    exact = z * np.asarray(
        torch.erf(torch.log1p(torch.exp(torch.clamp(t(z), max=50.0))))
    )
    fast = np.asarray(_serf_fast(jnp.asarray(z)))  # f32 in, f32 poly out
    assert np.max(np.abs(fast - exact)) < 1.2e-3
    # f32 serf() stays exact (no fast-path leak)
    got32 = np.asarray(serf(jnp.asarray(z)))
    np.testing.assert_allclose(got32, exact, rtol=5e-4, atol=1e-5)
    # bf16 serf() output within bf16 round-off of the exact value
    zb = jnp.asarray(z[::100], jnp.bfloat16)
    gotb = np.asarray(serf(zb), np.float32)
    exb = exact[::100]
    # bound: bf16 input/output quantization (~0.4% rel) + 1.2e-3 fit error
    assert np.all(np.abs(gotb - exb) <= np.maximum(np.abs(exb) * 1.6e-2, 2e-2))


def test_gelu_matches_reference(rng):
    # transformer.py:7-8
    x = rng.normal(size=(33, 17)).astype(np.float32) * 3
    want = t(x) * 0.5 * (1.0 + torch.erf(t(x) / np.sqrt(2.0)))
    np.testing.assert_allclose(
        np.asarray(gelu_erf(jnp.asarray(x))), want.numpy(), rtol=1e-6, atol=3e-6
    )


def test_masked_mlm_nll_label0_semantics(rng):
    # roco_utils.py:228-229: NLLLoss over log_softmax, no ignore_index.
    B, T, V = 4, 11, 37
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = rng.integers(0, V, size=(B, T))
    targets[:, :5] = 0  # unmasked positions still contribute label-0 loss
    want = torch.nn.NLLLoss()(
        F.log_softmax(t(logits), dim=-1).permute(0, 2, 1), t(targets).long()
    )
    got = masked_mlm_nll(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_cross_entropy(rng):
    logits = rng.normal(size=(8, 23)).astype(np.float32)
    targets = rng.integers(0, 23, size=(8,))
    want = torch.nn.CrossEntropyLoss()(t(logits), t(targets).long())
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def _torch_asl(inputs, target, gamma_pos=0.0, gamma_neg=4.0, eps=0.1):
    # oracle restating models/asl_singlelabel.py:23-53
    num_classes = inputs.shape[-1]
    log_preds = F.log_softmax(inputs, dim=-1)
    targets_classes = torch.zeros_like(inputs).scatter_(
        1, target.long().unsqueeze(1), 1
    )
    anti = 1 - targets_classes
    xs_pos = torch.exp(log_preds) * targets_classes
    xs_neg = (1 - torch.exp(log_preds)) * anti
    w = torch.pow(
        1 - xs_pos - xs_neg, gamma_pos * targets_classes + gamma_neg * anti
    )
    log_preds = log_preds * w
    if eps > 0:
        targets_classes = targets_classes.mul(1 - eps).add(eps / num_classes)
    return (-targets_classes.mul(log_preds)).sum(dim=-1).mean()


def test_asl_single_label(rng):
    logits = rng.normal(size=(16, 31)).astype(np.float32) * 2
    targets = rng.integers(0, 31, size=(16,))
    want = _torch_asl(t(logits), t(targets))
    got = asl_single_label(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_label_smoothing(rng):
    # vqamed2019/utils.py:184-198 train branch
    B, C = 8, 19
    logits = rng.normal(size=(B, C)).astype(np.float32)
    onehot = np.eye(C, dtype=np.float32)[rng.integers(0, C, size=(B,))]
    logp = F.log_softmax(t(logits), dim=-1)
    nll = (-logp * t(onehot)).sum(-1)
    smooth = -logp.mean(dim=-1)
    want = (0.9 * nll + 0.1 * smooth).mean()
    got = label_smoothing_loss(jnp.asarray(logits), jnp.asarray(onehot), 0.1)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_smoothed_soft_target_ce(rng):
    # vqamed2019/utils.py:1296-1300
    B, C = 6, 13
    logits = rng.normal(size=(B, C)).astype(np.float32)
    soft = rng.random(size=(B, C)).astype(np.float32)
    want = torch.mean(torch.sum(-t(soft) * F.log_softmax(t(logits), 1), 1))
    got = smoothed_soft_target_ce(jnp.asarray(logits), jnp.asarray(soft))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_mse_distillation(rng):
    pred = rng.normal(size=(4, 9, 16)).astype(np.float32)
    target = rng.normal(size=(4, 9, 16)).astype(np.float32)
    want = torch.nn.MSELoss()(t(pred), t(target))
    got = mse_distillation(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def _torch_supcon(features, mask=None, labels=None, temperature=0.07):
    # oracle restating models/SupConLoss/loss.py:21-98 (contrast_mode='all')
    bsz = features.shape[0]
    if labels is None and mask is None:
        mask = torch.eye(bsz, dtype=torch.float32)
    elif labels is not None:
        labels = labels.contiguous().view(-1, 1)
        mask = torch.eq(labels, labels.T).float()
    else:
        mask = mask.float()
    contrast_count = features.shape[1]
    contrast_feature = torch.cat(torch.unbind(features, dim=1), dim=0)
    anchor_feature = contrast_feature
    anchor_count = contrast_count
    anchor_dot = torch.matmul(anchor_feature, contrast_feature.T) / temperature
    logits_max, _ = torch.max(anchor_dot, dim=1, keepdim=True)
    logits = anchor_dot - logits_max.detach()
    mask = mask.repeat(anchor_count, contrast_count)
    logits_mask = torch.scatter(
        torch.ones_like(mask), 1, torch.arange(bsz * anchor_count).view(-1, 1), 0
    )
    mask = mask * logits_mask
    exp_logits = torch.exp(logits) * logits_mask
    log_prob = logits - torch.log(exp_logits.sum(1, keepdim=True))
    mean_log_prob_pos = (mask * log_prob).sum(1) / mask.sum(1)
    loss = -mean_log_prob_pos
    return loss.view(anchor_count, bsz).mean()


def _normed(rng, shape):
    f = rng.normal(size=shape).astype(np.float32)
    return f / np.linalg.norm(f, axis=-1, keepdims=True)


def test_supcon_simclr_identity_mask(rng):
    feats = _normed(rng, (10, 2, 32))
    want = _torch_supcon(t(feats))
    got = supcon_loss(jnp.asarray(feats))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_supcon_float_mask(rng):
    feats = _normed(rng, (6, 2, 16))
    mask = rng.random(size=(6, 6)).astype(np.float32)
    np.fill_diagonal(mask, 1.0)
    want = _torch_supcon(t(feats), mask=t(mask))
    got = supcon_loss(jnp.asarray(feats), mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_supcon_labels(rng):
    feats = _normed(rng, (8, 2, 16))
    labels = rng.integers(0, 3, size=(8,))
    want = _torch_supcon(t(feats), labels=t(labels))
    got = supcon_loss(jnp.asarray(feats), labels=jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_supcon_global_allgather_equals_big_batch(rng):
    """shard the batch over 4 virtual devices; all_gather path must equal the
    single-device loss on the full batch."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    feats = _normed(rng, (8, 2, 16))
    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))

    def local_loss(f):
        return supcon_loss(f, axis_name="data")

    sharded = jax.shard_map(
        local_loss,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P(),
        check_vma=False,
    )
    got = sharded(jnp.asarray(feats))
    want = supcon_loss(jnp.asarray(feats))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_split_two_views_matches_reference(rng):
    # supcon_utils.py:259-261
    feat = rng.normal(size=(12, 7)).astype(np.float32)
    f1, f2 = torch.split(t(feat), [6, 6], dim=0)
    want = torch.cat([f1.unsqueeze(1), f2.unsqueeze(1)], dim=1)
    got = split_two_views(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(got), want.numpy())


def test_mlm_accuracy(rng):
    logits = rng.normal(size=(2, 6, 9)).astype(np.float32)
    targets = np.zeros((2, 6), dtype=np.int32)
    targets[0, 1] = 3
    targets[1, 4] = 8
    correct, total = mlm_accuracy(jnp.asarray(logits), jnp.asarray(targets))
    pred = logits.argmax(-1)
    want_correct = (pred[0, 1] == 3) + (pred[1, 4] == 8)
    assert int(total) == 2
    assert int(correct) == int(want_correct)
