"""ROCO MLM (or distillation) pretraining driver.

CLI-compatible rebuild of pretrain/roco_train.py: same flags, same epoch
protocol (train -> validate -> plateau-LR on val loss -> recorder every 5
epochs -> best-val-loss weights), same metric names.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

from mmvqa_tpu.cli.common import (
    config_from_args,
    load_tokenizer,
    pretrain_parser,
    setup_runtime,
)
from mmvqa_tpu.data import BatchLoader, ROCODataset, get_keywords, load_mlm_data
from mmvqa_tpu.models import MMBert
from mmvqa_tpu.train import (
    ReduceLROnPlateau,
    checkpoint,
    create_train_state,
    make_distill_steps,
    make_mlm_steps,
    mlm_epoch,
)
from mmvqa_tpu.utils.logging import MetricSink, seed_everything


def init_model_state(
    model, cfg, mesh_spec, sample_batch, lr, clip=False,
    cnn_checkpoint="", bert_checkpoint="",
):
    """jit-compiled init (fast), optional pretrained backbone/embedding
    import (torchvision/timm/HF state_dicts), DP/TP placement. grad_accum
    comes from cfg (``--grad_accum``): N micro-batches average into one
    optimizer update (optax.MultiSteps)."""
    from mmvqa_tpu.parallel.sharding import place_state

    B = sample_batch["tokens"].shape[0]
    img = jnp.zeros((B, cfg.image_size, cfg.image_size, 3), jnp.float32)

    def init_fn(rng):
        return model.init(
            rng, img,
            jnp.asarray(sample_batch["tokens"]),
            jnp.asarray(sample_batch["segment_ids"]),
            jnp.asarray(sample_batch["input_mask"]),
        )

    variables = jax.jit(init_fn)(jax.random.PRNGKey(cfg.seed))
    if cnn_checkpoint:
        from mmvqa_tpu.models.import_torch import import_backbone_into_variables

        variables = import_backbone_into_variables(
            dict(variables), cfg, cnn_checkpoint
        )
        print(f"[mmvqa] imported CNN trunk from {cnn_checkpoint}")
    if bert_checkpoint:
        from mmvqa_tpu.models.import_torch import (
            convert_bert_embeddings,
            load_state_dict,
        )

        emb = convert_bert_embeddings(load_state_dict(bert_checkpoint))
        variables = dict(variables)
        params = dict(variables["params"])
        params["bert_embedding"] = emb
        variables["params"] = params
        print(f"[mmvqa] imported BERT embeddings from {bert_checkpoint}")
    state = create_train_state(
        variables, lr, clip, grad_accum=getattr(cfg, "grad_accum", 1)
    )
    return place_state(state, mesh_spec, fsdp=getattr(cfg, "fsdp", False))


def main(argv: Optional[list] = None) -> None:
    args = pretrain_parser(supcon=False).parse_args(argv)
    cfg = config_from_args(args)
    assert cfg.dataset in cfg.data_dir, (
        f"--dataset {cfg.dataset} not in --data_dir {cfg.data_dir}"
    )  # roco_train.py:64
    seed_everything(cfg.seed)
    mesh_spec, dtype = setup_runtime(cfg)
    sink = MetricSink(cfg.run_name, cfg.save_dir, cfg.wandb, config=vars(args))

    tok, cfg = load_tokenizer(cfg)
    train_df, val_df = load_mlm_data(cfg)
    keywords = get_keywords(cfg.data_dir)
    print(f"[mmvqa] train {len(train_df)} / val {len(val_df)} samples, "
          f"mesh {dict(mesh_spec.mesh.shape)}")

    from mmvqa_tpu.cli.common import make_image_cache

    img_cache = make_image_cache(cfg)
    train_ds = ROCODataset(cfg, train_df, tok, keywords, "train",
                           image_cache=img_cache)
    val_ds = ROCODataset(cfg, val_df, tok, keywords, "validation",
                         image_cache=img_cache)
    train_loader = BatchLoader(
        train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
        num_workers=cfg.num_workers,
        cache_images=getattr(args, "cache_images", False),
    )
    val_loader = BatchLoader(
        val_ds, cfg.batch_size, num_workers=cfg.num_workers,
        cache_images=getattr(args, "cache_images", False),
    )

    model = MMBert(cfg, dtype=dtype)
    init_batch = next(iter(train_loader))
    state = init_model_state(
        model, cfg, mesh_spec, init_batch, cfg.lr,
        cnn_checkpoint=getattr(args, "cnn_checkpoint", ""),
        bert_checkpoint=getattr(args, "bert_checkpoint", ""),
    )
    from mmvqa_tpu.cli.common import make_hist_logger

    hist_logger = make_hist_logger(
        cfg, model, mesh_spec, init_batch,
        "mlm" if cfg.task == "MLM" else "distill",
    )
    scheduler = ReduceLROnPlateau(
        lr=cfg.lr, patience=cfg.patience, factor=cfg.factor
    )

    multi_step = multi_eval = None
    if cfg.task == "MLM":
        if cfg.steps_per_call > 1:
            from mmvqa_tpu.train.steps import (
                make_multi_eval_step,
                make_multi_step,
            )

            train_step, eval_step, train_raw, eval_raw = make_mlm_steps(
                model, cfg, raw=True
            )
            multi_step = make_multi_step(train_raw, cfg.steps_per_call)
            multi_eval = make_multi_eval_step(eval_raw, cfg.steps_per_call)
        else:
            train_step, eval_step = make_mlm_steps(model, cfg)
    else:
        train_step, eval_step = make_distill_steps(model, cfg)

    start_epoch = 0
    best_loss = math.inf
    if cfg.resume:
        state, sstate, epoch = checkpoint.restore_recorder(cfg.save_dir, state)
        scheduler.load_state_dict(sstate)
        state = state.with_lr(scheduler.lr)
        start_epoch = epoch + 1
        if math.isinf(cfg.val_loss_resume):
            print("using val loss registered in scheduler")
            best_loss = scheduler.best
        else:
            print("using val loss given as argument")
            best_loss = cfg.val_loss_resume
        print(best_loss)

    save_recorder_every = 5
    rng = jax.random.PRNGKey(cfg.seed)
    os.makedirs(os.path.join(cfg.save_dir, cfg.task), exist_ok=True)

    if cfg.profile_dir:
        # capture a device trace of the first epoch (SURVEY.md §5.1)
        jax.profiler.start_trace(cfg.profile_dir)

    for epoch in range(start_epoch, cfg.epochs):
        print(f"Epoch {epoch + 1}/{cfg.epochs}")
        rng, erng = jax.random.split(rng)
        state, tm = mlm_epoch(
            train_step, state, train_loader, mesh_spec, erng, True,
            multi_step_fn=multi_step, steps_per_call=cfg.steps_per_call,
        )
        _, vm = mlm_epoch(
            eval_step, state, val_loader, mesh_spec, None, False,
            multi_step_fn=multi_eval, steps_per_call=cfg.steps_per_call,
        )


        if cfg.profile_dir and epoch == start_epoch:
            jax.profiler.stop_trace()
            print(f"[mmvqa] profiler trace written to {cfg.profile_dir}")
        new_lr = scheduler.step(vm["loss"])
        state = state.with_lr(new_lr)

        if (epoch + 1) % save_recorder_every == 0:
            checkpoint.save_recorder(
                cfg.save_dir, epoch, state, scheduler.state_dict()
            )

        log = {
            "epoch_train_loss": tm["loss"],
            "epoch_val_loss": vm["loss"],
            "learning_rate": new_lr,
            "epoch": epoch,
            "train_items_per_sec": tm["items_per_sec"],
        }
        # --watch: per-module grad norms (wandb.watch equivalent)
        log.update({k: v for k, v in tm.items() if k.startswith("gnorm/")})
        if cfg.task == "MLM":
            log["epoch_train_acc"] = tm.get("acc")
            log["epoch_val_acc"] = vm.get("acc")
            content = (
                f"Learning rate: {new_lr:.7f}, Train loss: {tm['loss']:.4f}, "
                f"Train acc: {tm.get('acc', 0):.4f} ,Val loss: "
                f"{vm['loss']:.4f}, Val acc: {vm.get('acc', 0):.4f}"
            )
        else:
            content = (
                f"Learning rate: {new_lr:.7f}, Train loss: {tm['loss']:.4f}, "
                f"Val loss: {vm['loss']:.4f}"
            )
        sink.log(log)
        if hist_logger is not None:
            # --watch_histograms: per-parameter grad/weight histograms,
            # one extra undonated step on a pinned batch (state unchanged)
            # fold_in, NOT split: a pure observability flag must not
            # consume from the main rng stream (it would change the
            # training trajectory vs a run without --watch_histograms)
            hrng = jax.random.fold_in(rng, 0x4157 + epoch)
            sink.log_histograms(hist_logger(state, hrng), step=epoch)
        print(content)
        print(f"[mmvqa] {tm['items_per_sec']:.1f} train items/s")

        if vm["loss"] < best_loss:
            print("Saving model")
            checkpoint.save_weights(
                os.path.join(cfg.save_dir, cfg.task, cfg.run_name), state
            )
            best_loss = vm["loss"]
    sink.finish()


if __name__ == "__main__":
    main()
