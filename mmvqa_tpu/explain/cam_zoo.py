"""CAM method zoo: GradCAM / GradCAM++ / XGradCAM / EigenCAM / ScoreCAM /
AblationCAM, functionally.

Rebuild of vqamed2019/grad_cam.py:65-72, which dispatches to the
pytorch_grad_cam library over the fine-tuned EfficientNetV2's last block.
Here each method is a pure function over the target activations A
(B, H, W, C), their gradients G w.r.t. the class logit (obtained with
``jax.grad`` via the perturbation tap — see mmvqa_tpu.explain.gradcam), and,
for the perturbation-based methods, a batched ``score_fn`` that maps masked
inputs to class scores.

All methods return (B, H, W) heatmaps normalized to [0, 1].
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _normalize(heat: jax.Array) -> jax.Array:
    heat = jnp.maximum(heat, 0.0)
    mx = jnp.max(heat, axis=(1, 2), keepdims=True)
    return heat / jnp.maximum(mx, 1e-12)


def grad_cam(acts: jax.Array, grads: jax.Array) -> jax.Array:
    """weights = GAP(grads); heat = relu(sum_c w_c A_c)."""
    w = jnp.mean(grads, axis=(1, 2), keepdims=True)
    return _normalize(jnp.sum(acts * w, axis=-1))


def grad_cam_pp(acts: jax.Array, grads: jax.Array) -> jax.Array:
    """GradCAM++ (Chattopadhyay et al. 2018): alpha-weighted positive grads."""
    g2 = grads ** 2
    g3 = g2 * grads
    denom = 2.0 * g2 + jnp.sum(acts * g3, axis=(1, 2), keepdims=True)
    alpha = g2 / jnp.where(denom != 0, denom, 1.0)
    w = jnp.sum(alpha * jnp.maximum(grads, 0.0), axis=(1, 2), keepdims=True)
    return _normalize(jnp.sum(acts * w, axis=-1))


def xgrad_cam(acts: jax.Array, grads: jax.Array) -> jax.Array:
    """XGradCAM: weights = sum(A*G) / (sum(A) + eps), per channel."""
    num = jnp.sum(acts * grads, axis=(1, 2), keepdims=True)
    den = jnp.sum(acts, axis=(1, 2), keepdims=True) + 1e-6
    return _normalize(jnp.sum(acts * (num / den), axis=-1))


def eigen_cam(acts: jax.Array) -> jax.Array:
    """EigenCAM: projection onto the first principal component of A."""
    B, H, W, C = acts.shape
    flat = acts.reshape(B, H * W, C)
    flat = flat - jnp.mean(flat, axis=1, keepdims=True)
    # first right singular vector per batch element
    _, _, vt = jnp.linalg.svd(flat, full_matrices=False)
    v1 = vt[:, 0, :]  # (B, C)
    proj = jnp.einsum("bpc,bc->bp", flat, v1).reshape(B, H, W)
    # sign fix: make the dominant response positive
    sign = jnp.sign(jnp.sum(jnp.maximum(proj, 0), axis=(1, 2))
                    - jnp.sum(jnp.maximum(-proj, 0), axis=(1, 2)))
    return _normalize(proj * sign[:, None, None])


def _upsample_mask(acts_c: jax.Array, size: int) -> jax.Array:
    """(B, h, w) activation channel -> (B, size, size) in [0, 1]."""
    up = jax.image.resize(acts_c, (acts_c.shape[0], size, size), "bilinear")
    lo = jnp.min(up, axis=(1, 2), keepdims=True)
    hi = jnp.max(up, axis=(1, 2), keepdims=True)
    return (up - lo) / jnp.maximum(hi - lo, 1e-12)


def score_cam(
    acts: jax.Array,
    image: jax.Array,
    score_fn: Callable[[jax.Array], jax.Array],
    chunk: int = 32,
) -> jax.Array:
    """ScoreCAM: weight each channel by the class score of the input masked
    with that channel's upsampled activation; softmax over channels.

    score_fn: (B, S, S, 3) -> (B,) class score. Runs C/chunk batched forwards.
    """
    B, h, w, C = acts.shape
    S = image.shape[1]
    scores = []
    for c0 in range(0, C, chunk):
        cs = acts[..., c0 : c0 + chunk]  # (B, h, w, k)
        masks = jax.vmap(
            lambda m: _upsample_mask(jnp.moveaxis(m, -1, 0), S),
        )(cs)  # (B, k, S, S)
        k = masks.shape[1]
        masked = image[:, None] * masks[..., None]  # (B, k, S, S, 3)
        flat = masked.reshape(B * k, S, S, 3)
        s = score_fn(flat).reshape(B, k)
        scores.append(s)
    weights = jax.nn.softmax(jnp.concatenate(scores, axis=1), axis=1)
    return _normalize(jnp.einsum("bhwc,bc->bhw", acts, weights))


def ablation_cam(
    acts: jax.Array,
    rerun_fn: Callable[[jax.Array], jax.Array],
    base_score: jax.Array,
    chunk: int = 32,
) -> jax.Array:
    """AblationCAM: weight_c = (base - score with channel c zeroed) / base.

    rerun_fn: ablated activations (B, h, w, C) -> (B,) class score (the model
    re-run FROM the target layer — use the perturbation tap with
    perturb = -acts_c to zero a channel).
    """
    B, h, w, C = acts.shape

    def one(c):
        # zero channel c with a traced index (at[..., c] needs a static one)
        keep = (jnp.arange(C) != c).astype(acts.dtype)
        return (base_score - rerun_fn(acts * keep)) / (base_score + 1e-8)

    # lax.map: the C model re-runs compile ONCE and execute as a single
    # dispatch (vmapped `chunk` at a time) — a eager Python loop costs
    # seconds per re-run through the axon tunnel
    w_ = jax.lax.map(one, jnp.arange(C), batch_size=min(chunk, C))  # (C, B)
    return _normalize(jnp.einsum("bhwc,bc->bhw", acts, w_.T))


CAM_METHODS = {
    "gradcam": grad_cam,
    "gradcam++": grad_cam_pp,
    "xgradcam": xgrad_cam,
    "eigencam": eigen_cam,
    "scorecam": score_cam,
    "ablationcam": ablation_cam,
}
