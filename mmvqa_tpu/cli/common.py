"""Shared CLI plumbing: reference-compatible argparse surfaces -> Config.

Flag names, defaults, and semantics mirror the four reference drivers
(pretrain/roco_train.py:21-61, pretrain/roco_supcon_train.py:25-74,
vqamed2019/train.py:30-81, vqamed2019/eval.py:25-68) so launch commands port
over unchanged. TPU-native flags (--dp_size/--tp_size/--vocab_file/...) are
additive.
"""

from __future__ import annotations

import argparse

import numpy as np

from mmvqa_tpu.core.config import Config


def add_tpu_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--vocab_file", type=str, default="",
                   help="WordPiece vocab.txt (default: search data_dir)")
    p.add_argument("--dp_size", type=int, default=-1,
                   help="data-parallel mesh size (-1 = all devices)")
    p.add_argument("--tp_size", type=int, default=1,
                   help="tensor-parallel mesh size")
    p.add_argument("--cp_size", type=int, default=1,
                   help="context(sequence)-parallel mesh size (no-op at the "
                        "reference sequence lengths; shards the token axis)")
    p.add_argument("--fsdp", action="store_true", default=False,
                   help="ZeRO-style fully-sharded data parallelism: shard "
                        "params + optimizer state over the data axis "
                        "(~1/dp per-device state memory, same math)")
    p.add_argument("--pp_size", type=int, default=1,
                   help="pipeline-parallel mesh size: GPipe microbatch "
                        "schedule over the layer stack (vanilla transformer "
                        "only; composes with --dp_size)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches per data shard (0 = auto: 2*pp "
                        "if it divides the per-shard batch, else pp)")
    p.add_argument("--cache_images", action="store_true", default=False,
                   help="cache decoded images in RAM (train datasets cache "
                        "only the decode; per-epoch randomness is kept)")
    p.add_argument("--image_cache_dir", type=str, default="",
                   help="persistent disk-backed decoded-image cache (uint8 "
                        "memmap keyed by path+size) — makes EVERY epoch "
                        "incl. the first host-unbound after one build")
    p.add_argument("--profile_dir", type=str, default="",
                   help="jax.profiler trace output dir")
    p.add_argument("--debug_nans", action="store_true", default=False)
    p.add_argument("--use_sim_mask", action="store_true", default=False,
                   help="actually pass the similarity mask to SupConLoss "
                        "(the reference computes but drops it)")
    p.add_argument("--cnn_checkpoint", type=str, default="",
                   help="torch state_dict (torchvision resnet152 / timm "
                        "tf_efficientnetv2_m) to import as the CNN trunk")
    p.add_argument("--bert_checkpoint", type=str, default="",
                   help="HF bert state_dict to import as the embedding table")
    p.add_argument("--steps_per_call", type=int, default=60,
                   help="chain K train steps into one jit dispatch (scan); "
                        "amortizes the ~83 ms per-dispatch tunnel overhead "
                        "(measured K-sweep: 149.1/143.6/142.3 ms/step at "
                        "K=10/30/60 — 60 is the settled sweet spot)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="average N micro-batches into one optimizer update "
                        "(effective batch = N x batch_size)")
    p.add_argument("--token_head", type=str, default="auto",
                   choices=["auto", "conv", "einsum", "pallas",
                            "pallas_sharded"],
                   help="visual-token head impl (auto = Pallas for the "
                        "stage-0 map on a single TPU chip, or the "
                        "shard_map'd kernel on a multi-chip dp/tp mesh)")
    p.add_argument("--tiny_cnn", action="store_true", default=False,
                   help="1-block-per-stage CNN trunks (smoke runs/CI only)")
    p.add_argument("--attention_impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas", "ring"],
                   help="attention core (ring = blockwise ring attention "
                        "over the context mesh axis; needs seq_len %% "
                        "cp_size == 0)")


def pretrain_parser(supcon: bool = False) -> argparse.ArgumentParser:
    """roco_train.py:21-61 / roco_supcon_train.py:25-74 flag surface."""
    p = argparse.ArgumentParser(
        description="Pretrain on ROCO with MLM"
        + (" + contrastive" if supcon else "")
    )
    p.add_argument("-r", "--run_name", type=str, required=True)
    p.add_argument("--data_dir", type=str, default="roco")
    p.add_argument("--save_dir", type=str, default="MMBERT/pretrain/save")
    p.add_argument("--mlm_prob", type=float, required=True)
    p.add_argument("--mixed_precision", action="store_true", default=False)
    p.add_argument("--resume", action="store_true", default=False)
    if supcon:
        p.add_argument("--resume_dir", type=str,
                       default="ImageClef-2019-VQA-Med/mmbert/MLM/model.pt")
        p.add_argument("--no_recorder", action="store_true", default=False)
        p.add_argument("--task", type=str, default="MLM", choices=["MLM"])
        p.add_argument("--supcon", action="store_false", default=True)
        p.add_argument("--con_task", type=str, default="supcon",
                       choices=["supcon", "simclr"], required=True)
        p.add_argument("--similarity", type=str, default="jaccard_similarity",
                       choices=["jaccard", "cosine", "sentence_transformers",
                                "bert_score"], required=True)
        p.add_argument("--bert_score", type=str, default="bert",
                       choices=["bert", "scibert"])
    else:
        p.add_argument("--task", type=str, default="MLM",
                       choices=["MLM", "distillation"])
    p.add_argument("--clinicalbert", type=str,
                   default="emilyalsentzer/Bio_ClinicalBERT")
    p.add_argument("--max_token_length", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--factor", type=float, default=0.1)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--train_pct", type=float, default=1.0)
    p.add_argument("--valid_pct", type=float, default=1.0)
    p.add_argument("--test_pct", type=float, default=1.0)
    p.add_argument("--max_position_embeddings", type=int, default=75)
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--type_vocab_size", type=int, default=2)
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--hidden_dropout_prob", type=float, default=0.3)
    p.add_argument("--val_loss_resume", type=float, default=np.inf)
    p.add_argument("--dataset", type=str, default="roco")
    p.add_argument("--cnn_encoder", type=str, default="resnet152")
    p.add_argument("--transformer_model", type=str, default="transformer",
                   choices=["transformer", "realformer", "feedback-transformer"])
    p.add_argument("--num_vis", type=int, default=5)
    p.add_argument("--use_relu", action="store_true", default=False)
    # wandb.watch(model, log='all') equivalents (roco_train.py:80):
    # per-module grad-norm scalars from the compiled step / per-parameter
    # grad+weight histograms at epoch end
    p.add_argument("--watch", action="store_true", default=False)
    p.add_argument("--watch_histograms", action="store_true", default=False,
                   help="per-parameter grad/weight histograms at epoch end "
                        "(full wandb.watch log='all' fidelity)")
    # additive (the reference hard-codes 224 in its transforms,
    # roco_train.py:100-114); lets smoke runs use small images
    p.add_argument("--image_size", type=int, default=224)
    add_tpu_flags(p)
    return p


def vqa_parser(eval_only: bool = False) -> argparse.ArgumentParser:
    """vqamed2019/train.py:30-81 / eval.py:25-68 flag surface."""
    p = argparse.ArgumentParser(
        description="Evaluate" if eval_only else "Finetune on ImageClef 2019"
    )
    p.add_argument("--run_name", type=str, required=True)
    p.add_argument("--data_dir", type=str, default="ImageClef-2019-VQA-Med")
    p.add_argument("--model_dir", type=str,
                   default="MMBERT/pretrain/val_loss_3.pt")
    if not eval_only:
        p.add_argument("--resume_dir", type=str,
                       default="ImageClef-2019-VQA-Med/mmbert/MLM/model.pt")
    p.add_argument("--save_dir", type=str, default="ImageClef-2019-VQA-Med/mmbert")
    p.add_argument("--category", type=str, default=None)
    p.add_argument("--use_pretrained", action="store_true", default=False)
    if not eval_only:
        p.add_argument("--resume_training", action="store_true", default=False)
    p.add_argument("--mixed_precision", action="store_true", default=False)
    p.add_argument("--clip", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--train_pct", type=float, default=1.0)
    p.add_argument("--valid_pct", type=float, default=1.0)
    p.add_argument("--test_pct", type=float, default=1.0)
    p.add_argument("--max_position_embeddings", type=int, default=28)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--factor", type=float, default=0.1)
    p.add_argument("--patience", type=int, default=10)
    if not eval_only:
        p.add_argument("--counter", type=int, default=20)
    p.add_argument("--hidden_dropout_prob", type=float, default=0.3)
    p.add_argument("--smoothing", type=float, default=None)
    p.add_argument("--image_size", type=int, default=224)
    # reference default 312 conflicts with its own 768-wide BERT embeddings
    # (train.py:62); kept for CLI parity
    p.add_argument("--hidden_size", type=int, default=312)
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--type_vocab_size", type=int, default=2)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--num_vis", type=int, required=True)
    if not eval_only:
        p.add_argument("--wandb", action="store_false", default=True)
        # wandb.watch(model, log='all') equivalent (roco_train.py:80):
        # per-module grad-norm scalars from the train step into the sink
        p.add_argument("--watch", action="store_true", default=False)
        p.add_argument("--watch_histograms", action="store_true",
                       default=False,
                       help="per-parameter grad/weight histograms at epoch "
                            "end (full wandb.watch log='all' fidelity)")
        p.add_argument("--save_model_epoch", type=int, default=4)
    p.add_argument("--task", type=str, default="MLM",
                   choices=["MLM", "distillation"])
    p.add_argument("--clinicalbert", type=str,
                   default="emilyalsentzer/Bio_ClinicalBERT")
    p.add_argument("--dataset", type=str, default="VQA-Med")
    p.add_argument("--cnn_encoder", type=str, default="resnet152")
    p.add_argument("--use_relu", action="store_true", default=False)
    p.add_argument("--transformer_model", type=str, default="transformer",
                   choices=["transformer", "realformer", "feedback-transformer"])
    if not eval_only:
        p.add_argument("--loss", type=str, default="CrossEntropyLoss",
                       choices=["CrossEntropyLoss", "ASLSingleLabel"])
    add_tpu_flags(p)
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    fields = {f.name for f in Config.__dataclass_fields__.values()}
    kw = {k: v for k, v in vars(args).items() if k in fields and v is not None}
    if getattr(args, "val_loss_resume", None) is not None:
        kw["val_loss_resume"] = float(args.val_loss_resume)
    cfg = Config(**kw)
    if getattr(args, "smoothing", None) is not None:
        cfg = cfg.replace(smoothing=args.smoothing)
    if getattr(args, "category", None) is not None:
        cfg = cfg.replace(category=args.category)
    return cfg


def setup_runtime(cfg: Config):
    """Mesh + debug switches + dtype policy. Returns (mesh_spec, dtype)."""
    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core.cache import enable_compilation_cache
    from mmvqa_tpu.core.mesh import make_mesh

    cfg.validate()  # fail fast with a readable error, not a reshape crash
    enable_compilation_cache()
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    mesh_spec = make_mesh(cfg.dp_size, cfg.tp_size, cfg.cp_size, cfg.pp_size)
    from mmvqa_tpu.core import mesh as mesh_module

    mesh_module.set_current(mesh_spec)
    if cfg.attention_impl != "auto":
        from mmvqa_tpu.ops import attention

        if (cfg.attention_impl == "ring"
                and cfg.max_position_embeddings % mesh_spec.context_size):
            raise ValueError(
                f"--attention_impl ring needs seq_len "
                f"({cfg.max_position_embeddings}) divisible by --cp_size "
                f"({mesh_spec.context_size})")
        attention.IMPL_DEFAULT = cfg.attention_impl
        # only the ring impl consumes RING_MESH; leaving it set for
        # xla/pallas leaked process-global state across tests once
        # (commit e19de52) — scope it to the impl that needs it
        if cfg.attention_impl == "ring":
            attention.RING_MESH = mesh_spec.mesh
    dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    return mesh_spec, dtype


def make_hist_logger(cfg: Config, model, mesh_spec, batch,
                     kind: str, smoothing_table=None):
    """--watch_histograms: returns fn(state, rng) -> {name: (counts, lo,
    hi)} of per-parameter grad + weight histograms, or None when off.

    Runs ONE extra UNdonated train step per epoch on a pinned batch purely
    for its gradients (the updated state is discarded — training dynamics
    are untouched); histograms are binned device-side so the host pull is
    ~bins ints per parameter (train/steps.py::grad_weight_histograms).
    Reference: wandb.watch(model, log='all') per-parameter histograms
    (roco_train.py:80).
    """
    if not cfg.watch_histograms:
        return None
    import jax

    from mmvqa_tpu.parallel.sharding import place_batch
    from mmvqa_tpu.train import steps as steps_mod

    if kind == "mlm":
        *_, hist_raw, _ = steps_mod.make_mlm_steps(
            model, cfg, raw=True, histograms=True
        )
    elif kind == "supcon":
        *_, hist_raw, _ = steps_mod.make_supcon_steps(
            model, cfg, raw=True, histograms=True
        )
    elif kind == "vqa":
        *_, hist_raw, _ = steps_mod.make_vqa_steps(
            model, cfg, category_smoothing_table=smoothing_table,
            raw=True, histograms=True,
        )
    elif kind == "distill":
        *_, hist_raw, _ = steps_mod.make_distill_steps(
            model, cfg, raw=True, histograms=True
        )
    else:
        raise ValueError(f"unknown hist kind {kind!r}")
    placed = place_batch(
        {k: v for k, v in batch.items() if not isinstance(v, list)},
        mesh_spec,
    )
    fn = jax.jit(hist_raw)  # NO buffer donation: state is reused afterwards

    def run(state, rng):
        _, m = fn(state, placed, rng)
        return {k: v for k, v in m.items()
                if k.startswith(("ghist/", "whist/"))}

    return run


def make_image_cache(cfg: Config):
    """--image_cache_dir -> one persistent DecodedImageCache (or None),
    shared by every dataset of the run (keyed by path+size internally)."""
    if not cfg.image_cache_dir:
        return None
    from mmvqa_tpu.data.images import DecodedImageCache

    cache = DecodedImageCache(cfg.image_cache_dir, cfg.image_size)
    print(f"[mmvqa] decoded-image cache: {cfg.image_cache_dir} "
          f"({len(cache)} images present)")
    return cache


def load_tokenizer(cfg: Config):
    from mmvqa_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.find_and_load(cfg.data_dir, cfg.vocab_file)
    if tok.vocab_size != cfg.vocab_size:
        print(
            f"[mmvqa] vocab.txt has {tok.vocab_size} entries; overriding "
            f"--vocab_size {cfg.vocab_size}"
        )
        cfg = cfg.replace(vocab_size=tok.vocab_size)
    return tok, cfg
