"""VQA-Med 2019 evaluation + submission writer.

CLI-compatible rebuild of vqamed2019/eval.py: rebuilds the answer vocab with
the identical union/ordering, loads a fine-tuned checkpoint, computes
per-category accuracy + BLEU on the test set, and writes
``<model>_preds.csv`` + the pipe-separated ImageCLEF ``<model>_res.txt``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

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
from mmvqa_tpu.evaluation import (
    per_category_accuracy,
    per_category_bleu,
    write_predictions,
    write_submission,
)
from mmvqa_tpu.models import MMBert
from mmvqa_tpu.train import checkpoint, make_vqa_steps, vqa_epoch
from mmvqa_tpu.utils.logging import MetricSink, seed_everything


def main(argv: Optional[list] = None) -> None:
    parser = vqa_parser(eval_only=True)
    parser.add_argument(
        "--model_dirs", nargs="+", default=None,
        help="ensemble: average logits over several checkpoints "
             "(final_test, vqamed2019/utils.py:845-872)",
    )
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    seed_everything(cfg.seed)
    mesh_spec, dtype = setup_runtime(cfg)
    model_name = os.path.basename(cfg.model_dir)
    sink = MetricSink(
        "testing-" + model_name, cfg.save_dir, use_wandb=True,
        config=vars(args),
    )

    tok, cfg = load_tokenizer(cfg)
    train_df, val_df, test_df = load_vqa_data(cfg)
    train_df, val_df, test_df, idx2ans, num_classes = build_answer_vocab(
        train_df, val_df, test_df, cfg.category
    )
    cfg = cfg.replace(num_classes=num_classes)

    from mmvqa_tpu.cli.common import make_image_cache

    test_ds = VQADataset(cfg, test_df, tok, "test",
                         image_cache=make_image_cache(cfg))
    test_loader = BatchLoader(
        test_ds, cfg.batch_size, num_workers=cfg.num_workers
    )

    model = MMBert(cfg, dtype=dtype)
    state = init_model_state(
        model, cfg, mesh_spec, next(iter(test_loader)), cfg.lr
    )
    multi_eval = None
    if cfg.steps_per_call > 1:
        from mmvqa_tpu.train.steps import make_multi_eval_step

        _, eval_step, _, eval_raw = make_vqa_steps(model, cfg, raw=True)
        multi_eval = make_multi_eval_step(eval_raw, cfg.steps_per_call)
    else:
        _, eval_step = make_vqa_steps(model, cfg)

    model_paths = args.model_dirs or [cfg.model_dir]
    all_logits = []
    sm = None
    for path in model_paths:
        print("Loading model at ", path)
        loaded = checkpoint.load_weights(path)
        loaded = checkpoint.adapt_encoder_layout(
            {"params": state.params, "batch_stats": state.batch_stats},
            loaded,
        )
        checkpoint.check_compatible(
            {"params": state.params, "batch_stats": state.batch_stats},
            {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
            what=path,
        )
        state = state.replace(
            params=loaded["params"], batch_stats=loaded["batch_stats"]
        )
        _, sm = vqa_epoch(
            eval_step, state, test_loader, mesh_spec, None, False,
            collect_logits=True,
            multi_step_fn=multi_eval, steps_per_call=cfg.steps_per_call,
        )
        all_logits.append(sm["logits"])
    if len(all_logits) > 1:
        from mmvqa_tpu.evaluation.metrics import ensemble_logits

        mean_logits = ensemble_logits(all_logits)
        sm = dict(sm)
        sm["preds"] = np.argmax(mean_logits, axis=-1)
        print(f"[mmvqa] ensembled {len(all_logits)} models")

    acc = per_category_accuracy(sm["preds"], sm["targets"], test_df["category"])
    bleu = per_category_bleu(
        sm["preds"], sm["targets"], test_df["category"], idx2ans
    )
    sink.log({"test_loss": sm["loss"], **acc, **bleu})

    os.makedirs(cfg.save_dir, exist_ok=True)
    write_predictions(
        test_df, sm["preds"], idx2ans,
        os.path.join(cfg.save_dir, f"{model_name}_preds.csv"),
    )
    write_submission(
        test_df, sm["preds"], idx2ans,
        os.path.join(cfg.save_dir, f"{model_name}_res.txt"),
    )
    print("acc", acc)
    print("bleu", bleu)
    sink.finish()


if __name__ == "__main__":
    main()
