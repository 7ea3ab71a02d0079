"""VQA-Med 2019 fine-tuning driver.

CLI-compatible rebuild of vqamed2019/train.py: answer-vocab build over the
train+val+test union, optional pretrained-weight transfer with classifier
swap, CE/ASL/LabelSmoothByCategory losses, per-epoch train/val/TEST metric
sweep, plateau LR on val loss, dual best checkpoints (loss + acc), early
stopping.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax

from mmvqa_tpu.cli.common import (
    config_from_args,
    load_tokenizer,
    setup_runtime,
    vqa_parser,
)
from mmvqa_tpu.cli.roco_train import init_model_state
from mmvqa_tpu.data import (
    BatchLoader,
    VQADataset,
    build_answer_vocab,
    load_vqa_data,
)
from mmvqa_tpu.evaluation import per_category_accuracy, per_category_bleu
from mmvqa_tpu.models import MMBert
from mmvqa_tpu.train import (
    EarlyStopping,
    ReduceLROnPlateau,
    build_category_smoothing_table,
    checkpoint,
    make_vqa_steps,
    vqa_epoch,
)
from mmvqa_tpu.utils.logging import MetricSink, seed_everything


def main(argv: Optional[list] = None) -> None:
    args = vqa_parser(eval_only=False).parse_args(argv)
    cfg = config_from_args(args)
    seed_everything(cfg.seed)
    mesh_spec, dtype = setup_runtime(cfg)
    sink = MetricSink(cfg.run_name, cfg.save_dir, cfg.wandb, config=vars(args))

    tok, cfg = load_tokenizer(cfg)
    train_df, val_df, test_df = load_vqa_data(cfg)
    train_df, val_df, test_df, idx2ans, num_classes = build_answer_vocab(
        train_df, val_df, test_df, cfg.category
    )
    cfg = cfg.replace(num_classes=num_classes)
    print("numclasses", num_classes)

    from mmvqa_tpu.cli.common import make_image_cache

    img_cache = make_image_cache(cfg)
    train_ds = VQADataset(cfg, train_df, tok, "train", image_cache=img_cache)
    val_ds = VQADataset(cfg, val_df, tok, "eval", image_cache=img_cache)
    test_ds = VQADataset(cfg, test_df, tok, "test", image_cache=img_cache)
    mk = lambda ds, sh: BatchLoader(
        ds, cfg.batch_size, shuffle=sh, seed=cfg.seed,
        num_workers=cfg.num_workers,
        cache_images=getattr(args, "cache_images", False),
    )
    train_loader, val_loader, test_loader = (
        mk(train_ds, True), mk(val_ds, False), mk(test_ds, False)
    )

    model = MMBert(cfg, dtype=dtype)
    init_batch = next(iter(train_loader))
    state = init_model_state(
        model, cfg, mesh_spec, init_batch, cfg.lr, cfg.clip,
        cnn_checkpoint=getattr(args, "cnn_checkpoint", ""),
        bert_checkpoint=getattr(args, "bert_checkpoint", ""),
    )

    if cfg.use_pretrained:
        print("loading model from roco")
        print(cfg.model_dir)
        loaded = checkpoint.load_weights(cfg.model_dir)
        target = {"params": state.params, "batch_stats": state.batch_stats}
        loaded = checkpoint.adapt_encoder_layout(target, loaded)
        merged, n_ok, n_all = checkpoint.filtered_restore(target, loaded)
        print(f"[mmvqa] transferred {n_ok}/{n_all} tensors "
              "(classifier head re-initialized)")
        state = state.replace(
            params=merged["params"], batch_stats=merged["batch_stats"]
        )
    elif cfg.resume_training:
        print("resume training", cfg.resume_dir)
        loaded = checkpoint.load_weights(cfg.resume_dir)
        loaded = checkpoint.adapt_encoder_layout(
            {"params": state.params, "batch_stats": state.batch_stats},
            loaded,
        )
        checkpoint.check_compatible(
            {"params": state.params, "batch_stats": state.batch_stats},
            {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
            what=cfg.resume_dir,
        )
        state = state.replace(
            params=loaded["params"], batch_stats=loaded["batch_stats"]
        )
    else:
        print("from scratch")

    smoothing_table = None
    if cfg.smoothing:
        print("Using label smoothing")
        smoothing_table = build_category_smoothing_table(
            train_df, num_classes, train_ds.cats2ans, cfg.smoothing
        )
    elif cfg.loss == "ASLSingleLabel":
        print("Using ASLSingleLabel")
    else:
        print("Using CrossEntropyLoss")

    multi_step = multi_eval = None
    if cfg.steps_per_call > 1:
        from mmvqa_tpu.train.steps import make_multi_eval_step, make_multi_step

        train_step, eval_step, train_raw, eval_raw = make_vqa_steps(
            model, cfg, category_smoothing_table=smoothing_table, raw=True
        )
        multi_step = make_multi_step(train_raw, cfg.steps_per_call)
        multi_eval = make_multi_eval_step(eval_raw, cfg.steps_per_call)
    else:
        train_step, eval_step = make_vqa_steps(
            model, cfg, category_smoothing_table=smoothing_table
        )
    scheduler = ReduceLROnPlateau(
        lr=cfg.lr, patience=cfg.patience, factor=cfg.factor
    )
    stopper = EarlyStopping(patience=cfg.counter)
    from mmvqa_tpu.cli.common import make_hist_logger

    hist_logger = make_hist_logger(
        cfg, model, mesh_spec, init_batch, "vqa",
        smoothing_table=smoothing_table,
    )

    best_acc1 = 0.0
    best_loss = math.inf
    rng = jax.random.PRNGKey(cfg.seed)
    os.makedirs(os.path.join(cfg.save_dir, cfg.task), exist_ok=True)

    if cfg.profile_dir:
        # capture a device trace of the first epoch (SURVEY.md §5.1)
        jax.profiler.start_trace(cfg.profile_dir)

    for epoch in range(cfg.epochs):
        print(f"Epoch {epoch + 1}/{cfg.epochs}")
        rng, erng = jax.random.split(rng)
        state, tm = vqa_epoch(
            train_step, state, train_loader, mesh_spec, erng, True,
            multi_step_fn=multi_step, steps_per_call=cfg.steps_per_call,
        )
        _, vm = vqa_epoch(
            eval_step, state, val_loader, mesh_spec, None, False,
            multi_step_fn=multi_eval, steps_per_call=cfg.steps_per_call,
        )
        _, sm = vqa_epoch(
            eval_step, state, test_loader, mesh_spec, None, False,
            multi_step_fn=multi_eval, steps_per_call=cfg.steps_per_call,
        )


        if cfg.profile_dir and epoch == 0:
            jax.profiler.stop_trace()
            print(f"[mmvqa] profiler trace written to {cfg.profile_dir}")
        new_lr = scheduler.step(vm["loss"])
        state = state.with_lr(new_lr)

        if not cfg.category:
            val_acc = per_category_accuracy(
                vm["preds"], vm["targets"], val_df["category"], "val_"
            )
            test_acc = per_category_accuracy(
                sm["preds"], sm["targets"], test_df["category"]
            )
            test_bleu = per_category_bleu(
                sm["preds"], sm["targets"], test_df["category"], idx2ans
            )
            log = dict(test_acc)
            log.update(test_bleu)
            log.update(
                train_loss=tm["loss"], val_loss=vm["loss"],
                test_loss=sm["loss"], learning_rate=new_lr,
                val_total_acc=val_acc["val_total_acc"],
                train_items_per_sec=tm["items_per_sec"],
            )
            sink.log(log)
            monitored = val_acc["val_total_acc"]
            print(
                f"train {tm['loss']:.4f} val {vm['loss']:.4f} test "
                f"{sm['loss']:.4f} val_acc {monitored:.2f} "
                f"test_acc {test_acc['total_acc']:.2f} "
                f"({tm['items_per_sec']:.1f} items/s)"
            )
        else:
            val_acc_v = float((vm["preds"] == vm["targets"]).mean() * 100)
            test_acc_v = float((sm["preds"] == sm["targets"]).mean() * 100)
            from mmvqa_tpu.evaluation import bleu_score

            sink.log({
                "train_loss": tm["loss"], "val_loss": vm["loss"],
                "test_loss": sm["loss"], "learning_rate": new_lr,
                f"val_{cfg.category}_acc": val_acc_v,
                f"{cfg.category}_acc": test_acc_v,
                f"val_{cfg.category}_bleu": bleu_score(
                    vm["preds"], vm["targets"], idx2ans
                ),
                f"{cfg.category}_bleu": bleu_score(
                    sm["preds"], sm["targets"], idx2ans
                ),
            })
            monitored = val_acc_v
            print(f"val_{cfg.category}_acc {val_acc_v:.2f}")

        if hist_logger is not None:
            # fold_in, NOT split: a pure observability flag must not
            # consume from the main rng stream (it would change the
            # training trajectory vs a run without --watch_histograms)
            hrng = jax.random.fold_in(rng, 0x4157 + epoch)
            sink.log_histograms(hist_logger(state, hrng), step=epoch)

        if vm["loss"] < best_loss:
            print("Saving model by loss")
            checkpoint.save_weights(
                os.path.join(cfg.save_dir, cfg.task, cfg.run_name + "_loss"),
                state,
            )
            best_loss = vm["loss"]

        if monitored > best_acc1:
            print("Saving model")
            checkpoint.save_weights(
                os.path.join(cfg.save_dir, cfg.task, cfg.run_name), state
            )
            best_acc1 = monitored

        if stopper.update(best_acc1):
            print("Counter expired, finishing.")
            break
        if stopper.counter:
            print(f"Counter {stopper.counter}/{cfg.counter}")
    sink.finish()


if __name__ == "__main__":
    main()
