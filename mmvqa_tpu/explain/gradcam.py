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
    at the deepest tapped CNN map — inputs for any CAM-zoo method."""
    logits, feats = model.apply(
        variables, img, input_ids, segment_ids, input_mask,
        method=type(model).features_and_logits,
    )
    deepest = feats[-1] if "efficientnetv2" in model.cfg.cnn_encoder else feats[0]

    def f(eps):
        lg, _ = model.apply(
            variables, img, input_ids, segment_ids, input_mask,
            method=type(model).features_and_logits, perturb=eps,
        )
        return lg[0, answer], lg

    (_, lg), grads = jax.value_and_grad(f, has_aux=True)(
        jnp.zeros_like(deepest)
    )
    return deepest, grads, lg


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
