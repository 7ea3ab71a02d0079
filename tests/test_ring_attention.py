"""Ring attention (ops/ring_attention.py) vs the XLA attention cores.

Runs on the 8-virtual-device CPU mesh (conftest): DP2 x TP2 x CP2 and a
CP4 ring, forward and gradient parity against ops.attention's unsharded
paths, plus the impl='ring' dispatch plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.core.mesh import make_mesh
from mmvqa_tpu.ops import attention
from mmvqa_tpu.ops.attention import (
    realformer_attention,
    vanilla_attention,
)
from mmvqa_tpu.ops.ring_attention import (
    ring_realformer_attention,
    ring_vanilla_attention,
)

B, H, T, D = 4, 4, 16, 8


def _mask(rng):
    m = np.ones((B, T), np.float32)
    for i in range(B):
        m[i, rng.integers(T // 2, T):] = 0.0  # ragged padding tails
    return m


@pytest.mark.parametrize("dp,tp,cp", [(2, 2, 2), (2, 1, 4)])
def test_vanilla_ring_matches_xla(rng, dp, tp, cp):
    mesh = make_mesh(dp_size=dp, tp_size=tp, cp_size=cp).mesh
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
        for _ in range(3)
    )
    mask = jnp.asarray(_mask(rng))
    want = vanilla_attention(q, k, v, mask, impl="xla")
    got = ring_vanilla_attention(q, k, v, mask, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_vanilla_ring_gradients_match(rng):
    mesh = make_mesh(dp_size=2, tp_size=2, cp_size=2).mesh
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
        for _ in range(3)
    )
    mask = jnp.asarray(_mask(rng))
    g = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * g)

    ring = loss(lambda q, k, v: ring_vanilla_attention(q, k, v, mask, mesh))
    ref = loss(lambda q, k, v: vanilla_attention(q, k, v, mask, impl="xla"))
    for a, b in zip(
        jax.grad(ring, argnums=(0, 1, 2))(q, k, v),
        jax.grad(ref, argnums=(0, 1, 2))(q, k, v),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        )


@pytest.mark.parametrize("use_prev,use_mask", [(True, True), (False, True),
                                               (True, False)])
def test_realformer_ring_matches_xla(rng, use_prev, use_mask):
    mesh = make_mesh(dp_size=2, tp_size=2, cp_size=2).mesh
    E = D
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, T, H, E)).astype(np.float32))
        for _ in range(3)
    )
    prev = (
        jnp.asarray(rng.normal(size=(B, T, T, H)).astype(np.float32) * 0.3)
        if use_prev else None
    )
    mask = jnp.asarray(_mask(rng)) if use_mask else None
    ctx_w, sc_w = realformer_attention(q, k, v, prev, mask, impl="xla")
    ctx_g, sc_g = ring_realformer_attention(q, k, v, prev, mask, mesh)
    np.testing.assert_allclose(
        np.asarray(ctx_g), np.asarray(ctx_w), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(sc_g), np.asarray(sc_w), rtol=2e-5, atol=2e-5
    )


def test_realformer_ring_gradients_match(rng):
    mesh = make_mesh(dp_size=2, tp_size=2, cp_size=2).mesh
    E = D
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, T, H, E)).astype(np.float32))
        for _ in range(3)
    )
    prev = jnp.asarray(rng.normal(size=(B, T, T, H)).astype(np.float32) * 0.3)
    mask = jnp.asarray(_mask(rng))
    gc = jnp.asarray(rng.normal(size=(B, T, H, E)).astype(np.float32))
    gs = jnp.asarray(rng.normal(size=(B, T, T, H)).astype(np.float32) * 0.1)

    def loss(fn):
        def f(q, k, v, prev):
            ctx, sc = fn(q, k, v, prev)
            # both outputs engaged: the carried scores feed the next layer
            return jnp.sum(ctx * gc) + jnp.sum(sc * gs)
        return f

    ring = loss(lambda q, k, v, p: ring_realformer_attention(
        q, k, v, p, mask, mesh))
    ref = loss(lambda q, k, v, p: realformer_attention(
        q, k, v, p, mask, impl="xla"))
    for a, b in zip(
        jax.grad(ring, argnums=(0, 1, 2, 3))(q, k, v, prev),
        jax.grad(ref, argnums=(0, 1, 2, 3))(q, k, v, prev),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        )


def test_ring_dispatch(rng):
    q = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    with pytest.raises(ValueError, match="RING_MESH"):
        vanilla_attention(q, q, q, None, impl="ring")
    old = attention.RING_MESH
    try:
        attention.RING_MESH = make_mesh(dp_size=2, tp_size=2, cp_size=2).mesh
        got = vanilla_attention(q, q, q, None, impl="ring")
        want = vanilla_attention(q, q, q, None, impl="xla")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
        )
    finally:
        attention.RING_MESH = old


def test_ring_requires_divisible_T(rng):
    mesh = make_mesh(dp_size=2, tp_size=2, cp_size=2).mesh
    q = jnp.asarray(rng.normal(size=(B, H, T + 1, D)).astype(np.float32))
    with pytest.raises(ValueError, match="% cp"):
        ring_vanilla_attention(q, q, q, None, mesh)
