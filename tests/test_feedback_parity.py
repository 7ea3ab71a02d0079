"""Feedback Transformer numerical parity: numpy oracle restating the
reference semantics (feedback_transformer_pytorch.py:140-322) evaluated with
the Flax module's own parameters."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.models import FeedbackEncoder

B, H_DIM, LAYERS, HEADS, DHEAD = 2, 16, 2, 2, 8


def _ln(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _gelu(x):
    from scipy.special import erf

    return x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


def _bucket(rel, num_buckets=32, max_distance=128):
    n = np.maximum(-rel, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(int)
    val_large = np.minimum(val_large, num_buckets - 1)
    return np.where(is_small, n, val_large)


def _oracle(params, x, seq_len=2, mem_len=10**9):
    """Restates the reference forward (:257-312): window loop, memory FIFO
    with max-length truncation (:309-310), shared kv, T5 bias, causal self
    mask, GEGLU FF, layer-weighted agg."""
    p = params["params"]["segment"]
    Wkv = np.asarray(p["shared_kv"]["kernel"])
    bias_table = np.asarray(p["rel_bias"]["embedding"])  # (buckets, heads)
    lw = np.asarray(p["layer_weight"])
    lw = np.exp(lw - lw.max())
    lw = lw / lw.sum()

    Bz, T, D = x.shape
    inner = HEADS * DHEAD
    scale = DHEAD ** -0.5
    mem_k = np.zeros((Bz, 0, inner), np.float32)
    mem_v = np.zeros((Bz, 0, inner), np.float32)
    outputs = []
    pos = 0
    while pos < T:
        seg = x[:, pos : pos + seq_len]
        n = seg.shape[1]
        hiddens = [seg]
        h = seg
        self_attend = n > 1  # reference :163
        for li in range(LAYERS):
            ln = p[f"attn_norm_{li}"]
            y = _ln(h, np.asarray(ln["scale"]), np.asarray(ln["bias"]))
            q = (y @ np.asarray(p[f"to_q_{li}"]["kernel"])) * scale
            if self_attend:
                kv = y @ Wkv
                sk, sv = kv[..., :inner], kv[..., inner:]
                k = np.concatenate([mem_k, sk], axis=1)
                v = np.concatenate([mem_v, sv], axis=1)
            else:
                k, v = mem_k, mem_v
            j = k.shape[1]
            qh = q.reshape(Bz, n, HEADS, DHEAD).transpose(0, 2, 1, 3)
            kh = k.reshape(Bz, j, HEADS, DHEAD).transpose(0, 2, 1, 3)
            vh = v.reshape(Bz, j, HEADS, DHEAD).transpose(0, 2, 1, 3)
            sim = np.einsum("bhid,bhjd->bhij", qh, kh)
            rel = np.arange(j)[None, :] - np.arange(n)[:, None]
            bias = bias_table[_bucket(rel)]  # (n, j, heads)
            sim = sim + bias.transpose(2, 0, 1)[None]
            if self_attend:
                causal = np.triu(np.ones((n, j)), k=j - n + 1).astype(bool)
                sim = np.where(causal[None, None], -3.0e38, sim)
            att = _softmax(sim, -1)
            ctx = np.einsum("bhij,bhjd->bhid", att, vh)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(Bz, n, inner)
            wo = p[f"to_out_{li}"]
            h = h + ctx @ np.asarray(wo["kernel"]) + np.asarray(wo["bias"])
            ln2 = p[f"ff_norm_{li}"]
            y = _ln(h, np.asarray(ln2["scale"]), np.asarray(ln2["bias"]))
            ff = p[f"ff_{li}"]
            z = y @ np.asarray(ff["w_in"]["kernel"]) + np.asarray(ff["w_in"]["bias"])
            val, gate = np.split(z, 2, axis=-1)
            z = _gelu(gate) * val
            h = h + z @ np.asarray(ff["w_out"]["kernel"]) + np.asarray(
                ff["w_out"]["bias"]
            )
            hiddens.append(h)
        outputs.append(h)
        agg = sum(w * hh for w, hh in zip(lw, hiddens))
        kv = agg @ Wkv
        mem_k = np.concatenate([mem_k, kv[..., :inner]], axis=1)
        mem_v = np.concatenate([mem_v, kv[..., inner:]], axis=1)
        # enforce max length on memory buffer (reference :309-310)
        mem_k = mem_k[:, -mem_len:]
        mem_v = mem_v[:, -mem_len:]
        pos += n
    return np.concatenate(outputs, axis=1)


@pytest.mark.parametrize("T", [8, 7])  # even + odd (remainder window)
def test_feedback_matches_oracle(rng, T):
    x = rng.normal(size=(B, T, H_DIM)).astype(np.float32)
    enc = FeedbackEncoder(
        hidden_size=H_DIM, n_layers=LAYERS, heads=HEADS, dim_head=DHEAD
    )
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(enc.apply(params, jnp.asarray(x)))
    want = _oracle(params, x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("T", [24, 23])  # T >> mem_len; odd adds remainder
def test_feedback_fifo_truncation_matches_oracle(rng, T):
    """T > mem_len exercises the rolling FIFO (reference :309-310)."""
    mem_len = 8
    x = rng.normal(size=(B, T, H_DIM)).astype(np.float32)
    enc = FeedbackEncoder(
        hidden_size=H_DIM, n_layers=LAYERS, heads=HEADS, dim_head=DHEAD,
        mem_len=mem_len,
    )
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(enc.apply(params, jnp.asarray(x)))
    want = _oracle(params, x, mem_len=mem_len)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_feedback_dropout_active_when_not_deterministic(rng):
    """attn/ff dropout (reference mmbert.py:120-121 wires 0.1/0.1) must
    perturb the train-mode forward and be a no-op when deterministic."""
    x = jnp.asarray(rng.normal(size=(B, 8, H_DIM)).astype(np.float32))
    enc = FeedbackEncoder(
        hidden_size=H_DIM, n_layers=LAYERS, heads=HEADS, dim_head=DHEAD
    )
    assert enc.attn_dropout == 0.1 and enc.ff_dropout == 0.1
    params = enc.init(jax.random.PRNGKey(0), x)
    det = np.asarray(enc.apply(params, x, deterministic=True))
    det2 = np.asarray(enc.apply(params, x, deterministic=True))
    np.testing.assert_array_equal(det, det2)
    d1 = np.asarray(enc.apply(
        params, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    ))
    d2 = np.asarray(enc.apply(
        params, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    ))
    assert not np.allclose(det, d1)
    assert not np.allclose(d1, d2)
