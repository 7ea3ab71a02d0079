"""MarianMT batch back-translation (en -> L -> en) with periodic saves.

Rebuild of /root/reference/preprocess/translate_transformers.py:11-104:
``TransformerBackTranslation`` (forward + backward opus-mt models, batch
generate, :11-41), the (id, caption) iteration in dataframe order, the
``--save_freq``-samples periodic checkpoint (converted to every
``save_freq``-th batch exactly like :86-87), and the output format —
``caption_<lang>.csv`` with columns [id, caption_<lang>] — which is what
build_from_translation.py joins.

Deviation (documented in PARITY.md): checkpoints load with
``local_files_only=True`` from ``--model_dir`` or the HF cache — this
environment has no network and a hub download would hang, so a missing
model exits with a clear error instead. ``--num_workers`` is accepted
for surface parity but ignored (the host has one core; the torch
DataLoader worker pool it configured cannot help).
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
            f"MarianMT checkpoint '{name}' not found locally; back-"
            f"translation requires pre-downloaded opus-mt models ({e})"
        )
    return tok, model


class TransformerBackTranslation:
    """translate_transformers.py:11-41 (torch, batch generate)."""

    def __init__(self, src: str, trg: str, local_dir: str = ""):
        self.tok_f, self.model_f = load_marian(src, trg, local_dir)
        self.tok_b, self.model_b = load_marian(trg, src, local_dir)

    @staticmethod
    def _generate(texts, tok, model):
        import torch

        with torch.no_grad():
            enc = tok(texts, return_tensors="pt", padding=True,
                      truncation=True)
            out = model.generate(**enc)
        return [tok.decode(t, skip_special_tokens=True) for t in out]

    def translate(self, texts):
        mid = self._generate(texts, self.tok_f, self.model_f)
        return self._generate(mid, self.tok_b, self.model_b)

    __call__ = translate


def main(argv=None, translator=None) -> None:
    p = argparse.ArgumentParser(description="translation")
    p.add_argument("--roco_dir", type=str, default="~/roco/train/radiology")
    p.add_argument("--language", type=str, required=True,
                   help="language to translate to for back translation")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=16,
                   help="accepted for parity; ignored on this 1-core host")
    p.add_argument("--save_freq", type=int, default=2500,
                   help="checkpoint roughly every save_freq SAMPLES")
    p.add_argument("--model_dir", type=str, default="",
                   help="dir with local opus-mt-<src>-<dst> checkpoints")
    args = p.parse_args(argv)

    train_path = os.path.expanduser(args.roco_dir)
    train_data = pd.read_csv(os.path.join(train_path, "traindata.csv"))
    if translator is None:
        translator = TransformerBackTranslation(
            "en", args.language, args.model_dir
        )

    # reference iterates (id, caption) = columns 0 and 2 of the dataframe
    # (Captions_Dataset.__getitem__, :44-55) — positions that only fit the
    # 3-column upstream-ROCO csv [id, name, caption]; the repo's own
    # roco_data.py emits 2 columns [name, caption], against which the
    # reference IndexErrors. Read by NAME when possible, fall back to the
    # reference's positions. Captions stripped as in :55.
    cap_col = ("caption" if "caption" in train_data.columns
               else train_data.columns[2])
    ids = list(train_data.iloc[:, 0])
    captions = [str(c).strip() for c in train_data[cap_col]]
    n = len(captions)
    n_batches = max(1, (n + args.batch_size - 1) // args.batch_size)
    # saving every save_freq-th batch, computed as :86-87 does
    save_freq = max(1, n_batches * args.save_freq // max(n, 1))
    print(f"saving every {save_freq}th batch")

    col = "caption_" + args.language
    out_path = os.path.join(train_path, f"caption_{args.language}.csv")
    res = []

    def save():
        final = pd.concat(res)
        final.to_csv(out_path, index=False, header=final.columns)

    for i in range(0, n, args.batch_size):
        out = translator(captions[i:i + args.batch_size])
        info = pd.DataFrame()
        info["id"] = ids[i:i + args.batch_size]
        info[col] = out
        res.append(info)
        if (i // args.batch_size) % save_freq == 0:
            print("saving file")
            save()
    print("saving file")
    save()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
