"""End-to-end integration: fixtures -> datasets -> loader -> jit steps ->
epoch loops -> checkpoint round-trips, on the 8-device CPU mesh (DP) with a
tiny model. Mirrors the reference call stacks (SURVEY.md §3) hermetically.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.core.config import pretrain_config, supcon_config, vqa_config
from mmvqa_tpu.core.mesh import make_mesh
from mmvqa_tpu.data import (
    BatchLoader,
    ROCODataset,
    VQADataset,
    WordPieceTokenizer,
    build_answer_vocab,
    get_keywords,
    load_mlm_data,
    load_vqa_data,
)
from mmvqa_tpu.data.fixtures import make_roco_fixture, make_vqa_fixture
from mmvqa_tpu.models import MMBert
from mmvqa_tpu.similarity import SimilarityCalculator, build_mask
from mmvqa_tpu.train import (
    EarlyStopping,
    ReduceLROnPlateau,
    build_category_smoothing_table,
    checkpoint,
    create_train_state,
    make_mlm_steps,
    make_supcon_steps,
    make_vqa_steps,
    mlm_epoch,
    supcon_epoch,
    vqa_epoch,
)


@pytest.fixture(scope="module")
def roco_dir(tmp_path_factory):
    return make_roco_fixture(
        str(tmp_path_factory.mktemp("roco")), n_train=12, n_val=6
    )


@pytest.fixture(scope="module")
def vqa_dir(tmp_path_factory):
    return make_vqa_fixture(str(tmp_path_factory.mktemp("vqa")), n_per_cat=3)


def _tiny(cfg):
    return cfg.replace(
        hidden_size=32, n_layers=1, heads=4, tiny_cnn=True, image_size=32,
        max_position_embeddings=24, batch_size=8, num_workers=2,
    )


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp_size=4, tp_size=1, devices=jax.devices()[:4])


class TestMLMPipeline:
    def test_end_to_end(self, roco_dir, mesh):
        cfg = _tiny(pretrain_config(data_dir=roco_dir, mlm_prob=0.5))
        cfg = cfg.replace(vocab_size=0)  # placeholder, set from tokenizer
        tok = WordPieceTokenizer.find_and_load(data_dir=roco_dir)
        cfg = cfg.replace(vocab_size=tok.vocab_size)
        train_df, val_df = load_mlm_data(cfg)
        assert len(train_df) == 12 and len(val_df) == 6
        keywords = get_keywords(roco_dir)
        train_ds = ROCODataset(cfg, train_df, tok, keywords, "train")
        val_ds = ROCODataset(cfg, val_df, tok, keywords, "validation")
        train_loader = BatchLoader(
            train_ds, cfg.batch_size, shuffle=True, num_workers=2
        )
        val_loader = BatchLoader(val_ds, cfg.batch_size, num_workers=2)

        model = MMBert(cfg)
        sample = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((cfg.batch_size, 32, 32, 3)),
            jnp.asarray(sample["tokens"]),
            jnp.asarray(sample["segment_ids"]),
            jnp.asarray(sample["input_mask"]),
        )
        state = create_train_state(variables, cfg.lr)
        train_step, eval_step = make_mlm_steps(model, cfg)
        state, tm = mlm_epoch(
            train_step, state, train_loader, mesh, jax.random.PRNGKey(1), True
        )
        assert np.isfinite(tm["loss"]) and "acc" in tm
        _, vm = mlm_epoch(eval_step, state, val_loader, mesh, None, False)
        assert np.isfinite(vm["loss"])
        assert int(state.step) == len(train_loader)

    def test_overfit_single_batch(self, roco_dir, mesh):
        """Gradient-flow check in the spirit of the reference's
        train_one_epoch_test_parameters harness (roco_utils.py:406-543):
        loss on a fixed batch must drop under repeated steps, proving the
        CNN+transformer+heads all receive gradients."""
        cfg = _tiny(pretrain_config(data_dir=roco_dir, mlm_prob=0.9, lr=1e-3))
        tok = WordPieceTokenizer.find_and_load(data_dir=roco_dir)
        cfg = cfg.replace(vocab_size=tok.vocab_size, hidden_dropout_prob=0.0)
        train_df, _ = load_mlm_data(cfg)
        ds = ROCODataset(cfg, train_df, tok, get_keywords(roco_dir), "train")
        loader = BatchLoader(ds, 8, num_workers=2)
        batch = next(iter(loader))
        model = MMBert(cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((8, 32, 32, 3)),
            jnp.asarray(batch["tokens"]),
            jnp.asarray(batch["segment_ids"]),
            jnp.asarray(batch["input_mask"]),
        )
        state = create_train_state(variables, cfg.lr)
        train_step, _ = make_mlm_steps(model, cfg)
        from mmvqa_tpu.parallel.sharding import place_batch

        placed = place_batch(batch, mesh)
        losses = []
        for i in range(8):
            state, m = train_step(state, placed, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.8, losses


class TestSupConPipeline:
    def test_joint_step_with_and_without_mask(self, roco_dir, mesh):
        cfg = _tiny(
            supcon_config(data_dir=roco_dir, mlm_prob=0.3, con_task="supcon")
        )
        tok = WordPieceTokenizer.find_and_load(data_dir=roco_dir)
        cfg = cfg.replace(vocab_size=tok.vocab_size)
        train_df, _ = load_mlm_data(cfg)
        ds = ROCODataset(
            cfg, train_df, tok, get_keywords(roco_dir), "train",
            two_text_views=True,
        )
        # batch_size // 2 loader: two views restore the full batch
        # (roco_supcon_train.py:137-138)
        loader = BatchLoader(ds, cfg.batch_size // 2, num_workers=2)
        batch = next(iter(loader))
        assert "aug_tokens" in batch and isinstance(batch["caption"], list)

        model = MMBert(cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((4, 32, 32, 3)),
            jnp.asarray(batch["tokens"]),
            jnp.asarray(batch["segment_ids"]),
            jnp.asarray(batch["input_mask"]),
        )
        state = create_train_state(variables, cfg.lr)
        train_step, eval_step = make_supcon_steps(model, cfg)

        calc = SimilarityCalculator("jaccard")
        sim_mask_fn = lambda c, a: build_mask("supcon", c, a, calc)
        state, m = supcon_epoch(
            train_step, state, loader, mesh, jax.random.PRNGKey(1),
            sim_mask_fn=sim_mask_fn,
        )
        assert np.isfinite(m["loss"])
        assert np.isfinite(m["supcon_loss"]) and m["supcon_loss"] != 0

    def test_jaccard_mask_properties(self):
        caps = ["the lung shows pneumonia", "ct scan of brain"]
        augs = ["the lungs show pneumonia", "brain ct scan image"]
        mask = SimilarityCalculator.jaccard(caps, augs)
        assert mask.shape == (2, 2)
        np.testing.assert_allclose(np.diag(mask), 1.0)
        assert 0 < mask[0, 1] < 1 or mask[0, 1] == 0


class TestVQAPipeline:
    def _setup(self, vqa_dir, smoothing=None, loss="CrossEntropyLoss"):
        cfg = _tiny(vqa_config(data_dir=vqa_dir, smoothing=smoothing, loss=loss))
        tok = WordPieceTokenizer.find_and_load(data_dir=vqa_dir)
        cfg = cfg.replace(vocab_size=tok.vocab_size)
        train_df, val_df, test_df = load_vqa_data(cfg)
        train_df, val_df, test_df, idx2ans, n_cls = build_answer_vocab(
            train_df, val_df, test_df
        )
        cfg = cfg.replace(num_classes=n_cls)
        train_ds = VQADataset(cfg, train_df, tok, "train")
        val_ds = VQADataset(cfg, val_df, tok, "eval")
        return cfg, tok, train_df, val_df, test_df, idx2ans, train_ds, val_ds

    def test_end_to_end_with_metrics(self, vqa_dir, mesh):
        (cfg, tok, train_df, val_df, test_df, idx2ans,
         train_ds, val_ds) = self._setup(vqa_dir)
        train_loader = BatchLoader(train_ds, 8, shuffle=True, num_workers=2)
        val_loader = BatchLoader(val_ds, 8, num_workers=2)
        model = MMBert(cfg)
        b = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)),
            jnp.asarray(b["tokens"]), jnp.asarray(b["segment_ids"]),
            jnp.asarray(b["input_mask"]),
        )
        state = create_train_state(variables, cfg.lr, clip=True)
        train_step, eval_step = make_vqa_steps(model, cfg)
        state, tm = vqa_epoch(
            train_step, state, train_loader, mesh, jax.random.PRNGKey(1), True
        )
        assert np.isfinite(tm["loss"])
        _, vm = vqa_epoch(eval_step, state, val_loader, mesh, None, False)
        assert len(vm["preds"]) == len(val_df)

        from mmvqa_tpu.evaluation import per_category_accuracy, per_category_bleu

        acc = per_category_accuracy(
            vm["preds"], vm["targets"], val_df["category"], "val_"
        )
        bleu = per_category_bleu(
            vm["preds"], vm["targets"], val_df["category"], idx2ans, "val_"
        )
        assert "val_total_acc" in acc and "val_binary_acc" in acc
        assert np.isfinite(bleu["val_total_bleu"])

    def test_asl_and_category_smoothing_losses(self, vqa_dir, mesh):
        for smoothing, loss in ((None, "ASLSingleLabel"), (0.1, "CrossEntropyLoss")):
            (cfg, tok, train_df, *_rest, train_ds, _) = self._setup(
                vqa_dir, smoothing=smoothing, loss=loss
            )
            table = None
            if smoothing:
                table = build_category_smoothing_table(
                    train_df, cfg.num_classes, train_ds.cats2ans, smoothing
                )
                assert table.shape == (5, cfg.num_classes)
                np.testing.assert_allclose(
                    table.sum(1), smoothing, rtol=1e-5
                )
            loader = BatchLoader(train_ds, 8, num_workers=2)
            model = MMBert(cfg)
            b = next(iter(loader))
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)),
                jnp.asarray(b["tokens"]), jnp.asarray(b["segment_ids"]),
                jnp.asarray(b["input_mask"]),
            )
            state = create_train_state(variables, cfg.lr)
            train_step, _ = make_vqa_steps(
                model, cfg, category_smoothing_table=table
            )
            from mmvqa_tpu.parallel.sharding import place_batch

            state, m = train_step(
                state, place_batch(b, mesh), jax.random.PRNGKey(0)
            )
            assert np.isfinite(float(m["loss"]))

    def test_checkpoint_roundtrip_and_filtered_restore(self, vqa_dir, tmp_path):
        (cfg, tok, *_rest, train_ds, _) = self._setup(vqa_dir)
        model = MMBert(cfg)
        loader = BatchLoader(train_ds, 8, num_workers=2)
        b = next(iter(loader))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)),
            jnp.asarray(b["tokens"]), jnp.asarray(b["segment_ids"]),
            jnp.asarray(b["input_mask"]),
        )
        state = create_train_state(variables, cfg.lr)
        sched = ReduceLROnPlateau(lr=cfg.lr, patience=2, factor=0.5)
        sched.step(1.0)

        ckpt_dir = str(tmp_path / "save")
        checkpoint.save_recorder(ckpt_dir, 3, state, sched.state_dict())
        state2 = create_train_state(variables, cfg.lr)
        state2, sstate, epoch = checkpoint.restore_recorder(ckpt_dir, state2)
        assert epoch == 3
        assert sstate["best"] == 1.0
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(state.params)[0]),
            np.asarray(jax.tree.leaves(state2.params)[0]),
        )

        # cross-stage: pretrain weights (vocab head) -> vqa model (class head)
        pre_cfg = cfg.replace(dataset="roco", num_classes=0)
        pre_model = MMBert(pre_cfg)
        pre_vars = pre_model.init(
            jax.random.PRNGKey(1), jnp.zeros((8, 32, 32, 3)),
            jnp.asarray(b["tokens"]), jnp.asarray(b["segment_ids"]),
            jnp.asarray(b["input_mask"]),
        )
        merged, n_loaded, n_total = checkpoint.filtered_restore(
            dict(variables), dict(pre_vars)
        )
        assert 0 < n_loaded < n_total  # classifier_2 skipped (shape mismatch)
        # transferred leaf equals the pretrain value
        np.testing.assert_allclose(
            np.asarray(merged["params"]["fc1"]["kernel"]),
            np.asarray(pre_vars["params"]["fc1"]["kernel"]),
        )
        # class head kept the fine-tune init shape
        assert (
            merged["params"]["classifier_2"]["kernel"].shape[-1]
            == cfg.num_classes
        )


class TestSchedulers:
    def test_plateau_matches_torch_semantics(self):
        import torch

        lin = torch.nn.Linear(2, 2)
        opt = torch.optim.Adam(lin.parameters(), lr=1.0)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, patience=2, factor=0.5
        )
        mine = ReduceLROnPlateau(lr=1.0, patience=2, factor=0.5)
        vals = [1.0, 0.9, 0.95, 0.96, 0.97, 0.98, 0.5, 0.6, 0.7, 0.8, 0.9]
        for v in vals:
            tsched.step(v)
            mine.step(v)
            assert opt.param_groups[0]["lr"] == pytest.approx(mine.lr), v

    def test_early_stopping_counter(self):
        es = EarlyStopping(patience=2)
        assert not es.update(10.0)
        assert not es.update(9.0)   # counter 1
        assert not es.update(9.0)   # counter 2
        assert es.update(9.0)       # counter 3 > 2 -> stop
        es2 = EarlyStopping(patience=2)
        es2.update(1.0)
        es2.update(0.5)
        assert not es2.update(2.0)  # improvement resets
