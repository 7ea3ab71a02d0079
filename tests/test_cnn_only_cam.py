"""CNN-only (question-independent) CAM — the reference's library-CAM
weight-surgery path (grad_cam.py:112-133) rebuilt functionally: the
fine-tuned trunk runs standalone; the explained score is the dominant
pooled feature channel (documented deviation: no timm conv_head to copy).
"""

import numpy as np

import jax
import jax.numpy as jnp

from mmvqa_tpu.core.config import vqa_config
from mmvqa_tpu.explain import CAM_METHODS
from mmvqa_tpu.explain.gradcam import cnn_only_activations
from mmvqa_tpu.models import MMBert

B, T, S = 1, 12, 64


def _setup():
    cfg = vqa_config(
        cnn_encoder="tf_efficientnetv2_m",
        transformer_model="realformer",
        tiny_cnn=True,
        hidden_size=32,
        n_layers=1,
        vocab_size=50,
        max_position_embeddings=T,
        image_size=S,
        num_classes=7,
    )
    model = MMBert(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, S, S, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 50, (B, T)), jnp.int32)
    seg = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, seg, mask)
    return model, variables, img


def test_cnn_only_activations_and_cam():
    model, variables, img = _setup()
    acts, grads, pooled, target = cnn_only_activations(model, variables, img)
    # deepest effnet tap: 512 channels at S/32
    assert acts.shape == (B, S // 32, S // 32, 512)
    assert grads.shape == acts.shape
    assert pooled.shape == (B, 512)
    # the target is the argmax pooled channel and its gradient is nonzero
    assert target == int(np.argmax(np.asarray(pooled)[0]))
    assert float(jnp.sum(jnp.abs(grads))) > 0.0
    # gradient of GAP w.r.t. the tap at the target channel is 1/(h*w)
    hw = acts.shape[1] * acts.shape[2]
    np.testing.assert_allclose(
        np.asarray(grads[0, :, :, target]), np.full((2, 2), 1.0 / hw),
        rtol=1e-6,
    )
    # non-target channels get zero gradient (score touches one channel)
    other = (target + 1) % 512
    assert float(jnp.max(jnp.abs(grads[0, :, :, other]))) == 0.0

    heat = np.asarray(CAM_METHODS["gradcam"](acts, grads))[0]
    assert heat.shape == (S // 32, S // 32)
    assert heat.min() >= 0.0 and heat.max() <= 1.0 + 1e-6
