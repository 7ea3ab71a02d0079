"""Supervised-contrastive / SimCLR loss (models/SupConLoss/loss.py:11-98).

Faithful port of Yonglong Tian's SupConLoss in ``contrast_mode='all'`` with
temperature = base_temperature = 0.07: identity mask (SimCLR) when neither
labels nor mask is given, arbitrary float masks (similarity-weighted
positives) otherwise, self-contrast excluded, numerically-stabilized logits.

TPU addition (SURVEY.md §2.9): ``axis_name`` all-gathers the features across
the data-parallel mesh axis so the contrastive denominator sees the GLOBAL
batch — the reference only ever contrasts within the per-device batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def supcon_loss(
    features: jax.Array,
    labels: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
    axis_name: Optional[str] = None,
) -> jax.Array:
    """features: (bsz, n_views, d) L2-normalized projections.

    labels: optional (bsz,) int class ids -> equality mask.
    mask: optional (bsz, bsz) float positives mask (diagonal should be 1).
    axis_name: optional mesh axis to all-gather features/mask over before
    computing the loss (global-batch contrastive).
    """
    if features.ndim < 3:
        raise ValueError("features must be [bsz, n_views, ...]")
    if features.ndim > 3:
        features = features.reshape(features.shape[0], features.shape[1], -1)
    if labels is not None and mask is not None:
        raise ValueError("cannot define both labels and mask")

    if axis_name is not None:
        # Gather the global batch along the data axis. tiled=True concatenates
        # on the leading dim, so downstream indices stay contiguous.
        features = jax.lax.all_gather(features, axis_name, axis=0, tiled=True)
        if labels is not None:
            labels = jax.lax.all_gather(labels, axis_name, axis=0, tiled=True)
        if mask is not None:
            # Per-device masks only relate local pairs; a global similarity
            # mask must be built by the caller. Block-diagonal embed here.
            n = mask.shape[0]
            world = features.shape[0] // n
            idx = jax.lax.axis_index(axis_name)
            big = jnp.zeros((features.shape[0], features.shape[0]), mask.dtype)
            big = jax.lax.dynamic_update_slice(big, mask, (idx * n, idx * n))
            mask = jax.lax.psum(big, axis_name)
            del world

    bsz, n_views, _ = features.shape
    f32 = jnp.float32

    if labels is None and mask is None:
        mask = jnp.eye(bsz, dtype=f32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = jnp.equal(labels, labels.T).astype(f32)
    else:
        mask = mask.astype(f32)

    # (n_views*bsz, d): views stacked along the batch dim, view-major, exactly
    # like torch.cat(torch.unbind(features, dim=1)) (loss.py:58).
    contrast = jnp.concatenate(
        [features[:, v] for v in range(n_views)], axis=0
    ).astype(f32)
    if contrast_mode == "one":
        anchor = features[:, 0].astype(f32)
        anchor_count = 1
    elif contrast_mode == "all":
        anchor = contrast
        anchor_count = n_views
    else:
        raise ValueError(f"unknown contrast_mode {contrast_mode}")

    # HIGHEST precision: the 1/temperature=14.3x amplification makes the
    # default (bf16-pass) matmul visibly perturb the loss.
    logits = (
        jnp.matmul(anchor, contrast.T, precision=jax.lax.Precision.HIGHEST)
        / temperature
    )
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    mask = jnp.tile(mask, (anchor_count, n_views))
    n_anchor = bsz * anchor_count
    logits_mask = 1.0 - jnp.eye(n_anchor, mask.shape[1], dtype=f32)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.sum(mask, axis=1)

    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, bsz))


def split_two_views(feat: jax.Array) -> jax.Array:
    """(2*bsz, d) concatenated views -> (bsz, 2, d), matching the reference's
    split_feat (supcon_utils.py:259-261)."""
    bsz = feat.shape[0] // 2
    return jnp.stack([feat[:bsz], feat[bsz:]], axis=1)
