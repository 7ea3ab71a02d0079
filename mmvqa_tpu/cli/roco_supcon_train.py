"""ROCO MLM + SupCon/SimCLR joint pretraining driver.

CLI-compatible rebuild of pretrain/roco_supcon_train.py: similarity
calculator selection, two-crop views, the batch_size//2 loader (two views
restore the full batch, :137-138), joint NLL+SupCon loss, plain-MLM
validation, recorder/weights-only resume.

Parity note: the reference computes the similarity mask but does NOT pass it
to the loss (supcon_utils.py:286-287) — the default here reproduces that;
``--use_sim_mask`` wires the mask through (and on a device mesh the
contrastive denominator sees the GLOBAL batch, a capability the reference
lacks — SURVEY.md §2.9).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax

from mmvqa_tpu.cli.common import (
    config_from_args,
    load_tokenizer,
    pretrain_parser,
    setup_runtime,
)
from mmvqa_tpu.cli.roco_train import init_model_state
from mmvqa_tpu.data import BatchLoader, ROCODataset, get_keywords, load_mlm_data
from mmvqa_tpu.models import MMBert
from mmvqa_tpu.similarity import SimilarityCalculator, build_mask
from mmvqa_tpu.train import (
    ReduceLROnPlateau,
    checkpoint,
    make_supcon_steps,
    mlm_epoch,
    supcon_epoch,
)
from mmvqa_tpu.utils.logging import MetricSink, seed_everything


def main(argv: Optional[list] = None) -> None:
    args = pretrain_parser(supcon=True).parse_args(argv)
    cfg = config_from_args(args)
    cfg = cfg.replace(supcon=True)
    assert cfg.dataset in cfg.data_dir
    seed_everything(cfg.seed)
    mesh_spec, dtype = setup_runtime(cfg)
    sink = MetricSink(cfg.run_name, cfg.save_dir, cfg.wandb, config=vars(args))

    tok, cfg = load_tokenizer(cfg)
    train_df, val_df = load_mlm_data(cfg)
    keywords = get_keywords(cfg.data_dir)

    calculator = None
    if cfg.con_task == "supcon":
        calculator = SimilarityCalculator(
            cfg.similarity, clinicalbert=cfg.clinicalbert,
            bert_score_model=cfg.bert_score,
            max_token_length=cfg.max_token_length,
        )
    print("Similarity", cfg.similarity, "| con_task", cfg.con_task,
          "| mask wired into loss:", cfg.use_sim_mask)

    from mmvqa_tpu.cli.common import make_image_cache

    img_cache = make_image_cache(cfg)
    train_ds = ROCODataset(
        cfg, train_df, tok, keywords, "train", two_text_views=True,
        image_cache=img_cache,
    )
    val_ds = ROCODataset(cfg, val_df, tok, keywords, "validation",
                         image_cache=img_cache)
    # batch_size // 2: the two views restore the full batch
    train_loader = BatchLoader(
        train_ds, cfg.batch_size // 2, shuffle=True, seed=cfg.seed,
        num_workers=cfg.num_workers,
    )
    val_loader = BatchLoader(
        val_ds, cfg.batch_size, num_workers=cfg.num_workers
    )

    model = MMBert(cfg, dtype=dtype)
    init_batch = next(iter(train_loader))
    state = init_model_state(
        model, cfg, mesh_spec, init_batch, cfg.lr,
        cnn_checkpoint=getattr(args, "cnn_checkpoint", ""),
        bert_checkpoint=getattr(args, "bert_checkpoint", ""),
    )
    from mmvqa_tpu.cli.common import make_hist_logger

    hist_logger = make_hist_logger(cfg, model, mesh_spec, init_batch, "supcon")
    scheduler = ReduceLROnPlateau(
        lr=cfg.lr, patience=cfg.patience, factor=cfg.factor
    )
    multi_step = multi_step_masked = multi_eval = None
    if cfg.steps_per_call > 1:
        from mmvqa_tpu.train.steps import make_multi_eval_step, make_multi_step

        train_step, eval_step, train_raw, eval_raw = make_supcon_steps(
            model, cfg, raw=True
        )
        # the scanned train body fixes sim_mask=None (the reference's live
        # path); with --use_sim_mask the masks ride the scan as a stacked
        # batch field instead (supcon_epoch threads them per step)
        multi_step = make_multi_step(
            lambda s, b, k: train_raw(s, b, k, None), cfg.steps_per_call
        )
        if cfg.use_sim_mask and cfg.con_task == "supcon":
            def _masked_body(s, b, k):
                b = dict(b)
                return train_raw(s, b, k, b.pop("sim_mask"))

            multi_step_masked = make_multi_step(
                _masked_body, cfg.steps_per_call
            )
        multi_eval = make_multi_eval_step(eval_raw, cfg.steps_per_call)
    else:
        train_step, eval_step = make_supcon_steps(model, cfg)

    sim_mask_fn = None
    if cfg.use_sim_mask and cfg.con_task == "supcon":
        sim_mask_fn = lambda c, a: build_mask(cfg.con_task, c, a, calculator)
    elif calculator is not None:
        # reference live path: compute the mask, drop it (:286-287)
        sim_mask_fn = None

    start_epoch = 0
    best_loss = math.inf
    if cfg.resume:
        print("Resuming training")
        if cfg.no_recorder:
            loaded = checkpoint.load_weights(cfg.resume_dir)
            loaded = checkpoint.adapt_encoder_layout(
                {"params": state.params, "batch_stats": state.batch_stats},
                loaded,
            )
            checkpoint.check_compatible(
                {"params": state.params, "batch_stats": state.batch_stats},
                {"params": loaded["params"],
                 "batch_stats": loaded["batch_stats"]},
                what=cfg.resume_dir,
            )
            state = state.replace(
                params=loaded["params"], batch_stats=loaded["batch_stats"]
            )
        else:
            state, sstate, epoch = checkpoint.restore_recorder(
                cfg.save_dir, state
            )
            scheduler.load_state_dict(sstate)
            state = state.with_lr(scheduler.lr)
            start_epoch = epoch + 1
        best_loss = (
            scheduler.best
            if math.isinf(cfg.val_loss_resume)
            else cfg.val_loss_resume
        )
        print(best_loss)

    rng = jax.random.PRNGKey(cfg.seed)
    os.makedirs(os.path.join(cfg.save_dir, cfg.task), exist_ok=True)
    for epoch in range(start_epoch, cfg.epochs):
        print(f"Epoch {epoch + 1}/{cfg.epochs}")
        rng, erng = jax.random.split(rng)
        state, tm = supcon_epoch(
            train_step, state, train_loader, mesh_spec, erng,
            sim_mask_fn=sim_mask_fn,
            multi_step_fn=multi_step,
            masked_multi_step_fn=multi_step_masked,
            steps_per_call=cfg.steps_per_call,
        )
        _, vm = mlm_epoch(
            eval_step, state, val_loader, mesh_spec, None, False,
            multi_step_fn=multi_eval, steps_per_call=cfg.steps_per_call,
        )

        new_lr = scheduler.step(vm["loss"])
        state = state.with_lr(new_lr)

        if (epoch + 1) % 5 == 0:
            checkpoint.save_recorder(
                cfg.save_dir, epoch, state, scheduler.state_dict()
            )

        sink.log({
            "epoch_train_loss": tm["loss"],
            "epoch_val_loss": vm["loss"],
            "epoch_train_acc": tm["acc"],
            "epoch_val_acc": vm.get("acc"),
            "epoch_train_mlm_loss": tm["mlm_loss"],
            "epoch_train_supcon_loss": tm["supcon_loss"],
            "learning_rate": new_lr,
            "epoch": epoch,
            "train_items_per_sec": tm["items_per_sec"],
        })
        if hist_logger is not None:
            # fold_in, NOT split: a pure observability flag must not
            # consume from the main rng stream (it would change the
            # training trajectory vs a run without --watch_histograms)
            hrng = jax.random.fold_in(rng, 0x4157 + epoch)
            sink.log_histograms(hist_logger(state, hrng), step=epoch)
        print(
            f"Learning rate: {new_lr:.7f}, Train loss: {tm['loss']:.4f}, "
            f"Train acc: {tm['acc']:.4f} ,Val loss: {vm['loss']:.4f}, "
            f"Val acc: {vm.get('acc', 0):.4f} "
            f"({tm['items_per_sec']:.1f} items/s)"
        )

        if vm["loss"] < best_loss:
            print("Saving model")
            checkpoint.save_weights(
                os.path.join(cfg.save_dir, cfg.task, cfg.run_name), state
            )
            best_loss = vm["loss"]
    sink.finish()


if __name__ == "__main__":
    main()
