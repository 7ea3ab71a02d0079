"""Back-translation augmentation (en -> L -> en) over caption dataframes.

Rebuild of preprocess/translate_transformers.py (MarianMT batch translation
with periodic CSV checkpointing, :11-104) and the resumable protocol of
preprocess/translate.py (--resume_pos, :20-77). The googletrans web backend
is replaced by local MarianMT checkpoints (Helsinki-NLP opus-mt-*): this
environment has no network, so the models must already be on disk
(--model_dir / HF cache); otherwise the CLI exits with a clear error.
"""

from __future__ import annotations

import argparse
import os

import pandas as pd


def load_marian(src: str, dst: str, local_dir: str = ""):
    from transformers import MarianMTModel, MarianTokenizer

    name = (
        os.path.join(local_dir, f"opus-mt-{src}-{dst}")
        if local_dir
        else f"Helsinki-NLP/opus-mt-{src}-{dst}"
    )
    try:
        tok = MarianTokenizer.from_pretrained(name, local_files_only=True)
        model = MarianMTModel.from_pretrained(name, local_files_only=True)
    except Exception as e:
        raise SystemExit(
            f"MarianMT checkpoint '{name}' not found locally; back-translation "
            f"requires pre-downloaded opus-mt models ({e})"
        )
    return tok, model


def translate_batch(texts, tok, model):
    import torch

    with torch.no_grad():
        enc = tok(texts, return_tensors="pt", padding=True, truncation=True)
        out = model.generate(**enc)
    return [tok.decode(t, skip_special_tokens=True) for t in out]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="back-translate captions")
    p.add_argument("--roco_dir", type=str, required=True,
                   help="dir containing traindata.csv")
    p.add_argument("--language", type=str, required=True,
                   help="intermediate language (fr/de/es/...)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--resume_pos", type=int, default=0)
    p.add_argument("--save_every", type=int, default=50,
                   help="checkpoint csv every N batches")
    p.add_argument("--model_dir", type=str, default="",
                   help="dir with local opus-mt-<src>-<dst> checkpoints")
    args = p.parse_args(argv)

    df = pd.read_csv(os.path.join(args.roco_dir, "traindata.csv"))
    col = f"caption_{args.language}"
    out_path = os.path.join(args.roco_dir, f"caption_{args.language}.csv")
    if args.resume_pos and os.path.exists(out_path):
        done = pd.read_csv(out_path)
        results = list(done[col])[: args.resume_pos]
    else:
        results = []

    tok_f, model_f = load_marian("en", args.language, args.model_dir)
    tok_b, model_b = load_marian(args.language, "en", args.model_dir)

    captions = list(df["caption"])
    n = len(captions)
    i = len(results)
    batch_idx = 0
    while i < n:
        chunk = captions[i : i + args.batch_size]
        try:
            mid = translate_batch(chunk, tok_f, model_f)
            back = translate_batch(mid, tok_b, model_b)
        except Exception as e:
            # reference swallows per-chunk errors with a sentinel
            # (translate.py:28-34)
            back = [f"<translation-error: {e}>"] * len(chunk)
        results.extend(back)
        i += len(chunk)
        batch_idx += 1
        if batch_idx % args.save_every == 0:
            pd.DataFrame({col: results}).to_csv(out_path, index=False)
            print(f"checkpoint {i}/{n}")
    pd.DataFrame({col: results}).to_csv(out_path, index=False)
    print(f"done: {out_path}")


if __name__ == "__main__":
    main()
