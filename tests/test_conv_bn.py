"""Fused conv1x1+BN-stats kernel vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.ops.pallas_conv_bn import (
    conv1x1_stats,
    conv1x1_stats_reference,
)


@pytest.mark.parametrize("N", [512, 700])  # aligned + padded tail
def test_forward_matches_reference(rng, N):
    K, C = 24, 64
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32) * 0.1)
    y, s = conv1x1_stats(x, w)
    yr, sr = conv1x1_stats_reference(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_reference(rng):
    N, K, C = 700, 24, 64
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32) * 0.1)
    gy = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    gs = jnp.asarray(rng.normal(size=(2, C)).astype(np.float32) * 0.1)

    def loss(fn, x, w):
        y, s = fn(x, w)
        return jnp.sum(y * gy) + jnp.sum(s * gs)

    gx_f, gw_f = jax.grad(lambda a, b: loss(conv1x1_stats, a, b),
                          argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(lambda a, b: loss(conv1x1_stats_reference, a, b),
                          argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-3)


def test_bf16(rng):
    N, K, C = 512, 48, 96
    x = jnp.asarray(rng.normal(size=(N, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, C)) * 0.1, jnp.bfloat16)
    y, s = conv1x1_stats(x, w)
    yr, sr = conv1x1_stats_reference(x, w)
    assert y.dtype == jnp.bfloat16 and s.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                               rtol=2e-2, atol=0.5)
