"""Auxiliary subsystem tests: img-only/binary models, CAM zoo, SupConEncoder,
2020 binary dataset, ensemble averaging, distributed helpers."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.core.config import vqa_config
from mmvqa_tpu.explain.cam_zoo import (
    ablation_cam,
    eigen_cam,
    grad_cam,
    grad_cam_pp,
    score_cam,
    xgrad_cam,
)
from mmvqa_tpu.evaluation.metrics import ensemble_logits
from mmvqa_tpu.models.img_only import ImageOnlyClassifier
from mmvqa_tpu.models.supcon_encoder import SupConEncoder


class TestCAMZoo:
    B, H, W, C = 2, 4, 4, 8

    def _inputs(self, rng):
        acts = rng.random((self.B, self.H, self.W, self.C)).astype(np.float32)
        grads = rng.normal(size=(self.B, self.H, self.W, self.C)).astype(
            np.float32
        )
        return jnp.asarray(acts), jnp.asarray(grads)

    def test_gradient_methods_shapes_and_range(self, rng):
        acts, grads = self._inputs(rng)
        for fn in (grad_cam, grad_cam_pp, xgrad_cam):
            heat = np.asarray(fn(acts, grads))
            assert heat.shape == (self.B, self.H, self.W)
            assert heat.min() >= 0 and heat.max() <= 1.0 + 1e-6

    def test_gradcam_matches_manual(self, rng):
        acts, grads = self._inputs(rng)
        w = np.asarray(grads).mean(axis=(1, 2))
        manual = np.maximum(
            np.einsum("bhwc,bc->bhw", np.asarray(acts), w), 0
        )
        manual = manual / np.maximum(
            manual.max(axis=(1, 2), keepdims=True), 1e-12
        )
        np.testing.assert_allclose(
            np.asarray(grad_cam(acts, grads)), manual, rtol=1e-5, atol=1e-6
        )

    def test_eigencam(self, rng):
        acts, _ = self._inputs(rng)
        heat = np.asarray(eigen_cam(acts))
        assert heat.shape == (self.B, self.H, self.W)
        assert np.isfinite(heat).all()

    def test_scorecam_uniform_scores_is_mean(self, rng):
        acts, _ = self._inputs(rng)
        img = jnp.asarray(rng.random((self.B, 8, 8, 3)).astype(np.float32))
        heat = np.asarray(
            score_cam(acts, img, lambda x: jnp.ones((x.shape[0],)), chunk=4)
        )
        manual = np.asarray(acts).mean(-1)
        manual = np.maximum(manual, 0)
        manual /= np.maximum(manual.max(axis=(1, 2), keepdims=True), 1e-12)
        np.testing.assert_allclose(heat, manual, rtol=1e-4, atol=1e-5)

    def test_ablationcam(self, rng):
        acts, _ = self._inputs(rng)

        def rerun(ablated):
            return jnp.sum(ablated, axis=(1, 2, 3))

        base = jnp.sum(acts, axis=(1, 2, 3))
        heat = np.asarray(ablation_cam(acts, rerun, base, chunk=4))
        assert heat.shape == (self.B, self.H, self.W)
        assert np.isfinite(heat).all()


class TestImgOnly:
    def test_forward_and_keyword_path(self, rng):
        img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        kw = jnp.asarray([0, 2])
        model = ImageOnlyClassifier(
            num_classes=5, num_keywords=3, tiny=True,
            cnn_encoder="tf_efficientnetv2_m",
        )
        v = model.init(jax.random.PRNGKey(0), img, kw)
        logits = model.apply(v, img, kw)
        assert logits.shape == (2, 5)

        plain = ImageOnlyClassifier(num_classes=5, tiny=True,
                                    cnn_encoder="resnet152")
        v2 = plain.init(jax.random.PRNGKey(0), img)
        assert plain.apply(v2, img).shape == (2, 5)


class TestSupConEncoder:
    def test_normalized_projection(self, rng):
        img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        model = SupConEncoder(tiny=True, feat_dim=16)
        v = model.init(jax.random.PRNGKey(0), img)
        feat = model.apply(v, img)
        assert feat.shape == (2, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(feat), axis=-1), 1.0, rtol=1e-5
        )


def test_ensemble_logits(rng):
    a = rng.normal(size=(4, 7)).astype(np.float32)
    b = rng.normal(size=(4, 7)).astype(np.float32)
    np.testing.assert_allclose(ensemble_logits([a, b]), (a + b) / 2)


def test_binary_dataset(tmp_path, rng):
    from mmvqa_tpu.data.fixtures import make_vqa_fixture
    from mmvqa_tpu.data.vqamed2020 import VQAMedBinary
    from mmvqa_tpu.data.tokenizer import WordPieceTokenizer
    from mmvqa_tpu.data.datasets import load_vqa_data

    root = make_vqa_fixture(str(tmp_path / "vqa"), n_per_cat=3)
    cfg = vqa_config(data_dir=root, image_size=32, max_position_embeddings=20)
    tok = WordPieceTokenizer.find_and_load(data_dir=root)
    train_df, _, _ = load_vqa_data(cfg)
    ds = VQAMedBinary(cfg, train_df, tok, "train")
    assert len(ds) > 0  # only the binary yes/no rows survive
    s = ds[0]
    assert s["answer"] in (0, 1)
    assert s["image"].shape == (32, 32, 3)


def test_distributed_helpers():
    from mmvqa_tpu.core.distributed import all_hosts_mean, process_shard

    idx, cnt = process_shard()
    assert idx == 0 and cnt == 1
    assert all_hosts_mean(3.5) == 3.5
