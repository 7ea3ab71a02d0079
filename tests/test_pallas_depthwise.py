"""Pallas depthwise 3x3 kernel vs the XLA conv custom-call path.

Shapes mirror the real MBConv depthwise sites (models/effnetv2.py stages
3-6, reference image_encoding.py:26): 14x14 and 7x7 maps whose P=H*W is
NOT a sublane multiple, plus a small odd map for the mask logic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.ops.pallas_depthwise import (
    depthwise3x3,
    depthwise3x3_reference,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("B,H,W,C", [(2, 14, 14, 128), (4, 7, 7, 256)])
def test_forward_matches_reference(rng, dtype, B, H, W, C):
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32), dtype)
    w = jnp.asarray(
        rng.normal(size=(3, 3, C)).astype(np.float32) * 0.2, dtype
    )
    got = depthwise3x3(x, w)
    want = depthwise3x3_reference(x, w)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2 if dtype == jnp.bfloat16 else 2e-5,
        atol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
    )


@pytest.mark.parametrize("B,H,W,C", [(2, 14, 14, 128), (2, 5, 5, 128)])
def test_gradients_match_reference(rng, B, H, W, C):
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, C)).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w) * g)

    gx_p, gw_p = jax.grad(loss(depthwise3x3), argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss(depthwise3x3_reference), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-3
    )


def test_cross_impl_param_tree_identical(rng):
    """DW_PALLAS must not change the param tree: the depthwise weight
    lives at stage*_block*/dw/kernel with the nn.Conv feature-group shape
    (3, 3, 1, C) under both impls, so checkpoints transfer across
    topologies (ADVICE r2 token-head lesson)."""
    from mmvqa_tpu.models import effnetv2

    arch = (("mb", 1, 3, 1, 2, 8, 0.25),)
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    trees = {}
    old = effnetv2.DW_PALLAS
    try:
        for impl in (False, True):
            effnetv2.DW_PALLAS = impl
            model = effnetv2.EffNetV2Features(arch=arch, stem_ch=8)
            vs = model.init(jax.random.PRNGKey(0), img)
            trees[impl] = jax.tree_util.tree_map(
                lambda x: (x.shape, x.dtype), vs["params"]
            )
    finally:
        effnetv2.DW_PALLAS = old
    assert jax.tree_util.tree_structure(trees[False]) == \
        jax.tree_util.tree_structure(trees[True])
    assert trees[False] == trees[True]


def test_border_masking(rng):
    """A one-hot input at the image corner must not leak across the
    flattened-roll wrap to the opposite border."""
    B, H, W, C = 1, 7, 7, 128
    x = np.zeros((B, H, W, C), np.float32)
    x[0, 0, 0, :] = 1.0
    w = jnp.asarray(np.ones((3, 3, C), np.float32))
    got = np.asarray(depthwise3x3(jnp.asarray(x), w))
    want = np.asarray(depthwise3x3_reference(jnp.asarray(x), w))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # the corner impulse reaches only its 2x2 in-bounds neighborhood
    assert got[0, :2, :2, 0].sum() == pytest.approx(4.0)
    assert np.abs(got[0, 2:, :, 0]).max() == 0.0
    assert np.abs(got[0, :, 2:, 0]).max() == 0.0
