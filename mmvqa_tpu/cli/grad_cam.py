"""Grad-CAM CLI: visual explanation for one VQA-Med image/question.

CLI-compatible rebuild of vqamed2019/grad_cam2.py (the full-multimodal-model
variant; grad_cam.py's library CAM zoo reduces to the same Grad-CAM quantity
for the default method). Writes ``<category>_<img>`` overlay into --save_dir
and prints question/answer/prediction (grad_cam2.py:190-193).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Grad-CAM for VQA-Med")
    p.add_argument("--data_dir", type=str, default="../ImageClef-2019-VQA-Med")
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--cnn_encoder", type=str, default="tf_efficientnetv2_m")
    p.add_argument("--use_relu", action="store_true", default=False)
    p.add_argument("--transformer_model", type=str, default="realformer",
                   choices=["transformer", "realformer", "feedback-transformer"])
    p.add_argument("--dataset", type=str, default="VQA-Med")
    p.add_argument("--num_vis", type=int, default=5)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--hidden_dropout_prob", type=float, default=0.3)
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--task", type=str, default="MLM")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--train_pct", type=float, default=1.0)
    p.add_argument("--valid_pct", type=float, default=1.0)
    p.add_argument("--test_pct", type=float, default=1.0)
    p.add_argument("--max_position_embeddings", type=int, default=28)
    p.add_argument("--vqa_img", type=str, default="synpic371.jpg")
    p.add_argument("--category", type=str, default="organ",
                   choices=["organ", "modality", "plane", "abnormality", "binary"])
    p.add_argument("--mode", type=str, default="Train",
                   choices=["Train", "Val", "Test"])
    p.add_argument("--save_dir", type=str, default="./gradcam-images")
    p.add_argument("--vocab_file", type=str, default="")
    p.add_argument("--method", type=str, default="gradcam",
                   choices=["gradcam", "gradcam++", "xgradcam", "eigencam",
                            "scorecam", "ablationcam"],
                   help="CAM variant (reference grad_cam.py:65-72 zoo)")
    p.add_argument("--tiny_cnn", action="store_true", default=False,
                   help="1-block-per-stage CNN trunks (smoke runs/CI only)")
    p.add_argument("--cnn_only", action="store_true", default=False,
                   help="question-independent CAM over the standalone "
                        "fine-tuned CNN trunk (reference grad_cam.py's "
                        "classifier-stripped timm model, :112-133)")
    return p


def main(argv: Optional[list] = None) -> None:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from mmvqa_tpu.cli.common import config_from_args, load_tokenizer
    from mmvqa_tpu.data import (
        build_answer_vocab,
        encode_text_vqa,
        load_image,
        load_vqa_data,
    )
    from mmvqa_tpu.explain import grad_cam_heatmap, overlay_heatmap
    from mmvqa_tpu.models import MMBert
    from mmvqa_tpu.train import checkpoint
    from mmvqa_tpu.utils.logging import seed_everything

    cfg = config_from_args(args).replace(category=None)
    seed_everything(cfg.seed)
    tok, cfg = load_tokenizer(cfg)

    train_df, val_df, test_df = load_vqa_data(cfg)
    train_df, val_df, test_df, idx2ans, num_classes = build_answer_vocab(
        train_df, val_df, test_df
    )
    cfg = cfg.replace(num_classes=num_classes)
    import pandas as pd

    df = pd.concat([train_df, val_df, test_df]).reset_index(drop=True)
    img_path = os.path.join(cfg.data_dir, args.mode, "images", args.vqa_img)
    info = df.loc[df["img_id"] == img_path]
    cat_df = info.loc[info["category"] == args.category]
    if cat_df["question"].empty:
        raise ValueError("Image does not exist in data split.")
    question = cat_df["question"].item()
    answer = int(cat_df["answer"].item())

    model = MMBert(cfg)
    img_u8 = load_image(img_path, cfg.image_size)
    img = (jnp.asarray(img_u8, jnp.float32) / 255.0 - 0.5) / 0.5
    img = img[None]
    enc = encode_text_vqa(question, tok, cfg.max_position_embeddings)
    ids = jnp.asarray(enc.tokens)[None]
    seg = jnp.asarray(enc.segment_ids)[None]
    mask = jnp.asarray(enc.input_mask)[None]

    import jax

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed), img, ids, seg, mask
    )
    loaded = checkpoint.load_weights(args.model_dir)
    loaded = checkpoint.adapt_encoder_layout(variables, loaded)
    checkpoint.check_compatible(
        variables,
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
        what=args.model_dir,
    )
    variables = {
        "params": loaded["params"], "batch_stats": loaded["batch_stats"]
    }

    if args.cnn_only:
        from mmvqa_tpu.explain import CAM_METHODS
        from mmvqa_tpu.explain.cam_zoo import ablation_cam, score_cam
        from mmvqa_tpu.explain.gradcam import cnn_only_activations

        acts, grads, pooled, target = cnn_only_activations(
            model, variables, img
        )
        logits = pooled  # the stripped-classifier "scores" (feature GAP)
        # score_fn/rerun_fn MUST be jitted: unjitted model.apply dispatches
        # op-by-op, pathological through the axon tunnel (~27 ms/op)
        if args.method == "scorecam":
            @jax.jit
            def score_jit(vs, masked_imgs):
                def trunk(m, im):
                    return m.trans(im, train=False)

                _, fts = model.apply(vs, masked_imgs, method=trunk)
                deepest = (fts[-1] if "efficientnetv2" in cfg.cnn_encoder
                           else fts[0])
                return jnp.mean(deepest, axis=(1, 2))[:, target]

            heat = np.asarray(
                score_cam(acts, img, lambda m: score_jit(variables, m))
            )[0]
        elif args.method == "ablationcam":
            @jax.jit
            def rerun_jit(vs, ablated):
                def trunk(m, im, perturb=None):
                    return m.trans(im, train=False, perturb=perturb)

                _, fts = model.apply(vs, img, method=trunk,
                                     perturb=ablated - acts)
                deepest = (fts[-1] if "efficientnetv2" in cfg.cnn_encoder
                           else fts[0])
                return jnp.mean(deepest, axis=(1, 2))[:, target]

            heat = np.asarray(
                ablation_cam(acts, lambda a: rerun_jit(variables, a),
                             pooled[:1, target])
            )[0]
        elif args.method == "eigencam":
            heat = np.asarray(CAM_METHODS["eigencam"](acts))[0]
        else:
            name = "gradcam" if args.method == "gradcam" else args.method
            heat = np.asarray(CAM_METHODS[name](acts, grads))[0]
    elif args.method == "gradcam":
        heat, logits = grad_cam_heatmap(
            model, variables, img, ids, seg, mask, answer
        )
    else:
        from mmvqa_tpu.explain import CAM_METHODS, grad_cam_activations
        from mmvqa_tpu.explain.cam_zoo import ablation_cam, score_cam

        acts, grads, logits = grad_cam_activations(
            model, variables, img, ids, seg, mask, answer
        )
        # score_fn/rerun_fn MUST be jitted: unjitted model.apply dispatches
        # op-by-op, pathological through the axon tunnel (~27 ms/op)
        if args.method == "scorecam":
            @jax.jit
            def score_jit(vs, masked_imgs):
                lg = model.apply(vs, masked_imgs,
                                 jnp.repeat(ids, masked_imgs.shape[0], 0),
                                 jnp.repeat(seg, masked_imgs.shape[0], 0),
                                 jnp.repeat(mask, masked_imgs.shape[0], 0))
                return lg[:, answer]

            heat = np.asarray(
                score_cam(acts, img, lambda m: score_jit(variables, m))
            )[0]
        elif args.method == "ablationcam":
            base = logits[0, answer]

            @jax.jit
            def rerun_jit(vs, ablated):
                lg, _ = model.apply(
                    vs, img, ids, seg, mask,
                    method=type(model).features_and_logits,
                    perturb=ablated - acts,
                )
                return lg[:, answer]

            def rerun_fn(ablated):
                return rerun_jit(variables, ablated)

            heat = np.asarray(
                ablation_cam(acts, rerun_fn, jnp.asarray([base]))
            )[0]
        elif args.method == "eigencam":
            heat = np.asarray(CAM_METHODS["eigencam"](acts))[0]
        else:
            heat = np.asarray(CAM_METHODS[args.method](acts, grads))[0]
    overlay = overlay_heatmap(img_u8, heat)

    os.makedirs(args.save_dir, exist_ok=True)
    from PIL import Image

    out_path = os.path.join(args.save_dir, f"{args.category}_{args.vqa_img}")
    Image.fromarray(overlay).save(out_path)

    print("question: ", question)
    print("answer: ", answer, idx2ans[answer])
    if args.cnn_only:
        print("target feature channel:", int(np.argmax(logits[0])))
    else:
        pred = int(np.argmax(logits[0]))
        print("preds:", pred, idx2ans[pred])
    print("saved:", out_path)


if __name__ == "__main__":
    main()
