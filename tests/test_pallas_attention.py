"""Pallas fused RealFormer attention vs the XLA reference path: forward and
gradients must agree (interpret mode on CPU; compiled on TPU).

Layout note: the pallas path carries scores head-major (B, H, T, T) between
layers; comparisons transpose via scores_to_reference_layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.ops.attention import realformer_attention
from mmvqa_tpu.ops.pallas_attention import (
    realformer_attention_pallas,
    scores_to_reference_layout,
)

B, T, H, E = 2, 12, 4, 16


def _inputs(rng, with_prev=True, with_mask=True):
    q = jnp.asarray(rng.normal(size=(B, T, H, E)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, E)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, E)).astype(np.float32))
    prev_hmaj = (
        jnp.asarray(rng.normal(size=(B, H, T, T)).astype(np.float32))
        if with_prev else None
    )
    mask = None
    if with_mask:
        m = np.ones((B, T), np.float32)
        m[:, -3:] = 0.0
        mask = jnp.asarray(m)
    return q, k, v, prev_hmaj, mask


def _ref_prev(prev_hmaj):
    return None if prev_hmaj is None else prev_hmaj.transpose(0, 2, 3, 1)


@pytest.mark.parametrize("with_prev", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_forward_matches_xla(rng, with_prev, with_mask):
    q, k, v, prev, mask = _inputs(rng, with_prev, with_mask)
    ctx_x, sc_x = realformer_attention(
        q, k, v, _ref_prev(prev), mask, impl="xla"
    )
    ctx_p, sc_p = realformer_attention_pallas(q, k, v, prev, mask)
    # masked-query (padding) rows: the xla path subtracts -10000 BEFORE its
    # softmax and loses ~1e-3 fp32 precision there; the kernel exploits the
    # row-constant invariance and is exact. Compare valid rows tightly.
    valid = T - 3 if with_mask else T
    np.testing.assert_allclose(
        np.asarray(ctx_p)[:, :valid], np.asarray(ctx_x)[:, :valid],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ctx_p), np.asarray(ctx_x), rtol=5e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(scores_to_reference_layout(sc_p)), np.asarray(sc_x),
        rtol=2e-5, atol=2e-4,
    )


def test_gradients_match_xla(rng):
    q, k, v, prev, mask = _inputs(rng, True, True)

    def grads(impl):
        def f(q, k, v, p):
            if impl == "pallas":
                ctx, sc = realformer_attention_pallas(q, k, v, p, mask)
                sc = scores_to_reference_layout(sc)
            else:
                ctx, sc = realformer_attention(q, k, v, p, mask, impl="xla")
            # both outputs participate (scores carry to the next layer)
            return jnp.sum(ctx * 0.7) + jnp.sum(jnp.tanh(sc * 0.01))

        return jax.grad(f, argnums=(0, 1, 2, 3))(
            q, k, v, prev if impl == "pallas" else _ref_prev(prev)
        )

    gx = grads("xla")
    gp = grads("pallas")
    names = ("dq", "dk", "dv", "dprev")
    for i, (a, b, name) in enumerate(zip(gp, gx, names)):
        if name == "dprev":
            a = scores_to_reference_layout(a)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=name
        )


@pytest.mark.parametrize("with_mask", [False, True])
def test_gradients_no_prev(rng, with_mask):
    q, k, v, _, mask = _inputs(rng, False, with_mask)

    def grads(impl):
        def loss(q, k, v):
            if impl == "pallas":
                ctx, _ = realformer_attention_pallas(q, k, v, None, mask)
            else:
                ctx, _ = realformer_attention(q, k, v, None, mask, impl="xla")
            return jnp.sum(ctx ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    gx = grads("xla")
    gp = grads("pallas")
    # with a mask, the xla path's -10000 fp32 cancellation on padded rows
    # bleeds ~1e-3 into dk/dv sums; without one the grads agree tightly
    rtol, atol = (1e-2, 1e-3) if with_mask else (5e-4, 5e-5)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
        )


def test_two_layer_chain_matches_encoder_semantics(rng):
    """Thread the carry through two 'layers' in each impl and compare final
    context — validates the opaque-carry layout contract end-to-end."""
    q1, k1, v1, _, mask = _inputs(rng, False, True)
    q2, k2, v2, _, _ = _inputs(rng, False, True)

    cx1, px = realformer_attention(q1, k1, v1, None, mask, impl="xla")
    cx2, _ = realformer_attention(q2, k2, v2, px, mask, impl="xla")

    cp1, pp = realformer_attention_pallas(q1, k1, v1, None, mask)
    cp2, _ = realformer_attention_pallas(q2, k2, v2, pp, mask)

    valid1 = np.asarray(mask)[0] > 0
    np.testing.assert_allclose(
        np.asarray(cp1)[:, valid1], np.asarray(cx1)[:, valid1],
        rtol=2e-5, atol=2e-5,
    )
    # second layer includes the -10000 row-constant in the xla carry; the
    # pallas path avoids that cancellation, so padded rows differ at ~1e-3
    valid = np.asarray(mask)[0] > 0
    np.testing.assert_allclose(
        np.asarray(cp2)[:, valid], np.asarray(cx2)[:, valid],
        rtol=1e-4, atol=1e-4,
    )
