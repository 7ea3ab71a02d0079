"""Grad-CAM through the full multimodal model, functionally.

Rebuild of vqamed2019/grad_cam2.py: the reference registers forward/backward
hooks on the deepest EfficientNetV2 feature map (image_encoding.py:109-128)
and calls ``logits[:, answer].backward()`` (grad_cam2.py:139-152). Here the
same quantity is ``jax.grad`` of the answer logit w.r.t. a zero perturbation
added to that map — no hooks, no mutable state, jit-compatible.

Heatmap recipe (grad_cam2.py:144-158): channel weights = gradient mean over
(batch, H, W); weighted channel sum; ReLU; normalize by max.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grad_cam_activations(
    model,
    variables,
    img: jax.Array,
    input_ids: jax.Array,
    segment_ids: jax.Array,
    input_mask: jax.Array,
    answer: int,
):
    """Returns (activations (B,h,w,C), grads (B,h,w,C), logits (B,classes))
    at the deepest tapped CNN map — inputs for any CAM-zoo method.

    The whole fwd+grad runs under ONE jit: eager full-model apply dispatches
    op-by-op, pathological through the axon tunnel (~27 ms/op)."""
    is_effnet = "efficientnetv2" in model.cfg.cnn_encoder

    @jax.jit
    def run(vs, im, ids, seg, mask):
        _, feats = model.apply(
            vs, im, ids, seg, mask, method=type(model).features_and_logits,
        )
        deepest = feats[-1] if is_effnet else feats[0]

        def f(eps):
            lg, _ = model.apply(
                vs, im, ids, seg, mask,
                method=type(model).features_and_logits, perturb=eps,
            )
            return lg[0, answer], lg

        (_, lg), grads = jax.value_and_grad(f, has_aux=True)(
            jnp.zeros_like(deepest)
        )
        return deepest, grads, lg

    return run(variables, img, input_ids, segment_ids, input_mask)


def cnn_only_activations(model, variables, img: jax.Array):
    """CNN-only CAM inputs — the reference's library-CAM path
    (grad_cam.py:112-133): the fine-tuned EfficientNetV2 weights are copied
    into a STANDALONE timm model with the classifier stripped, so the CAM is
    question-independent and the "score" it explains is the dominant pooled
    feature. Here the fine-tuned trunk runs standalone the same way; since
    the MMBert path carries no timm conv_head/classifier weights to surgery
    back (documented deviation), the score is the argmax channel of the
    GAP'd deepest tap.

    Returns (activations, grads, pooled (B, C), target_channel).
    """

    def trunk(m, im, perturb=None):
        return m.trans(im, train=False, perturb=perturb)

    is_effnet = "efficientnetv2" in model.cfg.cnn_encoder

    def deepest_of(feats):
        return feats[-1] if is_effnet else feats[0]

    # two jits (the target channel is picked on host between them) — eager
    # full-trunk applies are pathological through the axon tunnel
    @jax.jit
    def fwd(vs, im):
        _, feats = model.apply(vs, im, method=trunk)
        return deepest_of(feats)

    deepest = fwd(variables, img)
    pooled0 = jnp.mean(deepest, axis=(1, 2))  # (B, C)
    target = int(jnp.argmax(pooled0[0]))

    @jax.jit
    def grad_run(vs, im):
        def f(eps):
            _, fts = model.apply(vs, im, method=trunk, perturb=eps)
            pooled = jnp.mean(deepest_of(fts), axis=(1, 2))
            return pooled[0, target], pooled

        return jax.value_and_grad(f, has_aux=True)(
            jnp.zeros(deepest.shape, deepest.dtype)
        )

    (_, pooled), grads = grad_run(variables, img)
    return deepest, grads, pooled, target


def grad_cam_heatmap(
    model,
    variables,
    img: jax.Array,
    input_ids: jax.Array,
    segment_ids: jax.Array,
    input_mask: jax.Array,
    answer: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (heatmap (h, w) in [0, 1], logits (B, C))."""
    deepest, grads, lg = grad_cam_activations(
        model, variables, img, input_ids, segment_ids, input_mask, answer
    )
    # channel weights: mean over batch and spatial dims (grad_cam2.py:144)
    pooled = jnp.mean(grads, axis=(0, 1, 2))  # (C,) — NHWC here
    weighted = deepest * pooled[None, None, None, :]
    heat = jnp.mean(weighted, axis=-1)[0]  # average channels (:152)
    heat = jnp.maximum(heat, 0.0)
    heat = heat / jnp.maximum(jnp.max(heat), 1e-12)
    return np.asarray(heat), np.asarray(lg)


def overlay_heatmap(
    image_u8: np.ndarray, heatmap: np.ndarray, alpha: float = 0.4
) -> np.ndarray:
    """Upscale heatmap to the image, apply a JET colormap, blend
    (grad_cam2.py:183-188 used cv2; matplotlib's jet here)."""
    from PIL import Image

    h, w = image_u8.shape[:2]
    hm = Image.fromarray((heatmap * 255).astype(np.uint8)).resize(
        (w, h), Image.BILINEAR
    )
    hm = np.asarray(hm, np.float32) / 255.0
    try:
        import matplotlib.cm as cm

        colored = (cm.jet(hm)[..., :3] * 255).astype(np.float32)
    except Exception:  # matplotlib-free fallback: red channel ramp
        colored = np.stack(
            [hm * 255, np.zeros_like(hm), (1 - hm) * 255], axis=-1
        ).astype(np.float32)
    out = colored * alpha + image_u8.astype(np.float32)
    return np.clip(out, 0, 255).astype(np.uint8)
