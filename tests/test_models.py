"""Model-layer tests: numpy oracles restating the reference equations verify
the Flax wiring (param sharing, norm reuse, head transposes, fusion layout).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.core.config import Config
from mmvqa_tpu.models import (
    BertEncoder,
    EffNetV2Features,
    FeedbackEncoder,
    MMBert,
    RealFormerEncoder,
    ResNetFeatures,
)


def _np_layernorm(x, scale, bias, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _serf_np(x):
    from scipy.special import erf

    return x * erf(np.log1p(np.exp(np.minimum(x, 50.0))))


def _gelu_np(x):
    from scipy.special import erf

    return x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


class TestBertEncoder:
    B, T, H, HEADS, LAYERS = 2, 9, 32, 4, 2

    def _run(self, rng):
        x = rng.normal(size=(self.B, self.T, self.H)).astype(np.float32)
        mask = np.ones((self.B, self.T), np.float32)
        mask[:, -3:] = 0.0
        enc = BertEncoder(
            hidden_size=self.H, n_layers=self.LAYERS, n_heads=self.HEADS,
            dropout_rate=0.3, share="none", norm_pos="pre",
        )
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
        out = enc.apply(params, jnp.asarray(x), jnp.asarray(mask))
        return x, mask, params["params"], np.asarray(out)

    def test_norms_shared_across_layers(self, rng):
        _, _, p, _ = self._run(rng)
        # one norm1 (and per-layer attn/proj/ffn) — reference quirk
        assert "norm1" in p and "attention_0" in p and "attention_1" in p
        assert "norm1_2" not in p

    def test_matches_reference_math(self, rng):
        x, mask, p, got = self._run(rng)
        h = x.copy()
        d = self.H // self.HEADS

        def dense(name, layer, y):
            w = np.asarray(p[name][layer]["kernel"])
            b = np.asarray(p[name][layer].get("bias", 0))
            return y @ w + b

        for i in range(self.LAYERS):
            y = _np_layernorm(
                h, np.asarray(p["norm1"]["scale"]), np.asarray(p["norm1"]["bias"]),
                1e-12,
            )
            att = p[f"attention_{i}"]
            q = y @ np.asarray(att["proj_q"]["kernel"]) + np.asarray(att["proj_q"]["bias"])
            k = y @ np.asarray(att["proj_k"]["kernel"]) + np.asarray(att["proj_k"]["bias"])
            v = y @ np.asarray(att["proj_v"]["kernel"]) + np.asarray(att["proj_v"]["bias"])
            split = lambda t: t.reshape(self.B, self.T, self.HEADS, d).transpose(0, 2, 1, 3)
            q, k, v = split(q), split(k), split(v)
            scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d)
            scores = scores - 10000.0 * (1.0 - mask[:, None, None, :])
            probs = _np_softmax(scores, -1)
            ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(self.B, self.T, self.H)
            a = ctx @ np.asarray(p[f"proj_{i}"]["kernel"]) + np.asarray(p[f"proj_{i}"]["bias"])
            h = h + a
            y = _np_layernorm(
                h, np.asarray(p["norm1"]["scale"]), np.asarray(p["norm1"]["bias"]),
                1e-12,
            )
            ff = p[f"feedforward_{i}"]
            f = _gelu_np(y @ np.asarray(ff["fc1"]["kernel"]) + np.asarray(ff["fc1"]["bias"]))
            f = f @ np.asarray(ff["fc2"]["kernel"]) + np.asarray(ff["fc2"]["bias"])
            h = h + f
        np.testing.assert_allclose(got, h, rtol=2e-4, atol=2e-5)


class TestRealFormer:
    B, T, H, HEADS, LAYERS = 2, 7, 24, 8, 2

    def test_matches_reference_math(self, rng):
        E = self.H // self.HEADS
        x = rng.normal(size=(self.B, self.T, self.H)).astype(np.float32)
        mask = np.ones((self.B, self.T), np.float32)
        mask[:, -2:] = 0.0
        enc = RealFormerEncoder(
            hidden_size=self.H, n_layers=self.LAYERS, head_cnt=self.HEADS
        )
        params = enc.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(mask))
        got = np.asarray(enc.apply(params, jnp.asarray(x), jnp.asarray(mask)))

        p = params["params"]
        h = x.copy()
        prev = None
        for i in range(self.LAYERS):
            blk = p[f"block_{i}"]
            xh = h.reshape(self.B, self.T, self.HEADS, E)
            kqv = xh @ np.asarray(blk["kqv"]["kernel"])  # shared across heads
            k, q, v = np.split(kqv, 3, axis=-1)
            scores = np.einsum("bihe,bjhe->bijh", q, k) / np.sqrt(E)
            if prev is not None:
                scores = scores + prev
            scores = scores - 10000.0 * (1.0 - mask[:, :, None, None])
            prev = scores
            att = _np_softmax(scores, axis=2)
            ctx = np.einsum("bijh,bjhe->bihe", att, v).reshape(self.B, self.T, self.H)
            res = ctx @ np.asarray(blk["proj"]["kernel"])
            h = _np_layernorm(
                h + res, np.asarray(blk["ln1"]["scale"]), np.asarray(blk["ln1"]["bias"]),
                1e-5,
            )
            f = _serf_np(h @ np.asarray(blk["ff1"]["kernel"]) + np.asarray(blk["ff1"]["bias"]))
            f = f @ np.asarray(blk["ff2"]["kernel"]) + np.asarray(blk["ff2"]["bias"])
            h = _np_layernorm(
                h + f, np.asarray(blk["ln2"]["scale"]), np.asarray(blk["ln2"]["bias"]),
                1e-5,
            )
        # valid positions: fp32 noise only. masked-query rows accumulate
        # -10000/layer in the score carry, so fp32 loses ~1e-3 there (the
        # reference in fp32 does the same); they are padding positions.
        np.testing.assert_allclose(got[:, :5], h[:, :5], atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(got, h, atol=2e-3, rtol=5e-3)

    def test_mask_is_softmax_noop(self, rng):
        """The reference RealFormer masks the QUERY axis — softmax-invariant.
        Output with and without mask must agree (the carried scores differ)."""
        x = rng.normal(size=(2, 6, 16)).astype(np.float32)
        enc = RealFormerEncoder(hidden_size=16, n_layers=2, head_cnt=8)
        params = enc.init(jax.random.PRNGKey(2), jnp.asarray(x), None)
        mask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0], [1] * 6], np.float32))
        out_m = enc.apply(params, jnp.asarray(x), mask)
        out_n = enc.apply(params, jnp.asarray(x), None)
        # exact invariance mathematically; fp32 subtracting 10000/layer from
        # masked rows costs ~1e-3 of precision there
        np.testing.assert_allclose(
            np.asarray(out_m), np.asarray(out_n), rtol=5e-3, atol=2e-3
        )


class TestCNNs:
    def test_resnet_feature_shapes(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        model = ResNetFeatures(stage_sizes=(1, 1, 1, 1))  # tiny for test speed
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x)
        shapes = [f.shape for f in feats]
        assert shapes == [
            (1, 32, 32, 64),
            (1, 16, 16, 256),
            (1, 8, 8, 512),
            (1, 4, 4, 1024),
            (1, 2, 2, 2048),
        ]

    def test_effnetv2_feature_shapes(self, rng):
        # one block per stage for speed; channels/strides as v2-m
        arch = tuple(
            (b, 1, k, s, e, c, se)
            for (b, _, k, s, e, c, se) in (
                ("fused", 3, 3, 1, 1, 24, 0.0),
                ("fused", 5, 3, 2, 4, 48, 0.0),
                ("fused", 5, 3, 2, 4, 80, 0.0),
                ("mb", 7, 3, 2, 4, 160, 0.25),
                ("mb", 14, 3, 1, 6, 176, 0.25),
                ("mb", 18, 3, 2, 6, 304, 0.25),
                ("mb", 5, 3, 1, 6, 512, 0.25),
            )
        )
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        model = EffNetV2Features(arch=arch)
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x)
        chans = [f.shape[-1] for f in feats]
        reds = [64 // f.shape[1] for f in feats]
        assert chans == [24, 48, 80, 160, 176, 304, 512]
        assert reds == [2, 4, 8, 16, 16, 32, 32]


def _tiny_cfg(**kw):
    base = dict(
        hidden_size=24,
        n_layers=1,
        heads=4,
        vocab_size=50,
        max_position_embeddings=16,
        num_vis=5,
        cnn_encoder="resnet152",
        transformer_model="transformer",
        dataset="roco",
        task="MLM",
        tiny_cnn=True,
    )
    base.update(kw)
    return Config(**base)


def _batch(rng, cfg, B=2):
    img = jnp.asarray(rng.normal(size=(B, 32, 32, 3)).astype(np.float32))
    T = cfg.max_position_embeddings
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)))
    seg = jnp.asarray((rng.random((B, T)) > 0.5).astype(np.int32))
    mask = jnp.ones((B, T), jnp.float32)
    return img, ids, seg, mask


class TestMMBert:
    def test_mlm_forward_shapes(self, rng):
        cfg = _tiny_cfg()
        model = MMBert(cfg)
        img, ids, seg, mask = _batch(rng, cfg)
        variables = model.init(jax.random.PRNGKey(0), img, ids, seg, mask)
        logits = model.apply(variables, img, ids, seg, mask)
        assert logits.shape == (2, cfg.max_position_embeddings, cfg.vocab_size)

    def test_supcon_returns_normalized_features(self, rng):
        cfg = _tiny_cfg(supcon=True, feat_dim=8)
        model = MMBert(cfg)
        img, ids, seg, mask = _batch(rng, cfg)
        variables = model.init(jax.random.PRNGKey(0), img, ids, seg, mask)
        logits, feat = model.apply(variables, img, ids, seg, mask)
        assert feat.shape == (2, 8)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(feat), axis=-1), 1.0, rtol=1e-5
        )

    def test_vqa_forward_and_fusion_overwrites_cls(self, rng):
        cfg = _tiny_cfg(dataset="VQA-Med", num_classes=7,
                        transformer_model="realformer", hidden_size=24)
        model = MMBert(cfg)
        img, ids, seg, mask = _batch(rng, cfg)
        variables = model.init(jax.random.PRNGKey(0), img, ids, seg, mask)
        logits = model.apply(variables, img, ids, seg, mask)
        assert logits.shape == (2, 7)
        # fusion overwrites positions 0..num_vis-1 => changing token id at
        # position 0 (CLS) must NOT change the output (mmbert.py:64-66 quirk)
        ids2 = ids.at[:, 0].set((ids[:, 0] + 1) % cfg.vocab_size)
        logits2 = model.apply(variables, img, ids2, seg, mask)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits2), atol=1e-6
        )
        # but a text-position change does
        ids3 = ids.at[:, cfg.num_vis + 2].set(
            (ids[:, cfg.num_vis + 2] + 1) % cfg.vocab_size
        )
        logits3 = model.apply(variables, img, ids3, seg, mask)
        assert not np.allclose(np.asarray(logits), np.asarray(logits3))

    def test_effnet_7_tokens(self, rng):
        cfg = _tiny_cfg(cnn_encoder="tf_efficientnetv2_m", num_vis=7)
        model = MMBert(cfg)
        img, ids, seg, mask = _batch(rng, cfg)
        variables = model.init(jax.random.PRNGKey(0), img, ids, seg, mask)
        logits = model.apply(variables, img, ids, seg, mask)
        assert logits.shape == (2, cfg.max_position_embeddings, cfg.vocab_size)


class TestFeedback:
    def test_shapes_and_segment_causality(self, rng):
        B, T, H = 2, 7, 16  # odd T exercises the remainder window
        x = rng.normal(size=(B, T, H)).astype(np.float32)
        enc = FeedbackEncoder(hidden_size=H, n_layers=2, heads=2, dim_head=8)
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = enc.apply(params, jnp.asarray(x))
        assert out.shape == (B, T, H)
        assert np.isfinite(np.asarray(out)).all()
        # window-level causality: perturbing the last token must not change
        # outputs of earlier windows (memory only flows forward)
        x2 = x.copy()
        x2[:, -1] += 1.0
        out2 = enc.apply(params, jnp.asarray(x2))
        np.testing.assert_allclose(
            np.asarray(out[:, :6]), np.asarray(out2[:, :6]), atol=1e-5
        )
        assert not np.allclose(np.asarray(out[:, 6]), np.asarray(out2[:, 6]))
