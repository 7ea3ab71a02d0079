"""Hermetic synthetic datasets matching the exact on-disk layouts the
framework (and the reference) consume — for tests, smoke runs and benches
(SURVEY.md §4 prescription (b)). No reference equivalent.
"""

from __future__ import annotations

import os
import pickle
import random
from typing import List

import numpy as np
import pandas as pd

WORDS = (
    "chest x-ray shows bilateral pneumonia with pleural effusion ct scan of "
    "the abdomen demonstrates hepatic lesion mri axial view brain tumour in "
    "left lobe ultrasound image gallbladder cholecystitis suspected plane "
    "lungs heart normal abnormal mass fracture bone spine contrast sagittal "
    "coronal radiograph lateral"
).split()
KEYWORDS = ["pneumonia", "effusion", "lesion", "tumour", "fracture", "mass"]
CATEGORIES = ["plane", "modality", "binary", "organ", "abnormality"]
ANSWERS = {
    "plane": ["axial", "sagittal", "coronal", "lateral"],
    "modality": ["ct", "mri", "ultrasound", "x-ray"],
    "binary": ["yes", "no"],
    "organ": ["lung", "heart", "brain", "liver"],
    "abnormality": ["pneumonia", "tumour", "fracture", "mass"],
}


def _caption(rng: random.Random, n: int = 10) -> str:
    words = [rng.choice(WORDS) for _ in range(n)]
    words.insert(rng.randrange(n), rng.choice(KEYWORDS))
    return " ".join(words)


def _write_image(path: str, rng: np.random.Generator, size: int = 64):
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


def make_roco_fixture(
    root: str, n_train: int = 16, n_val: int = 8, seed: int = 0,
    image_size: int = 64,
) -> str:
    """<root>/{train,validation}/radiology/{images,csv} + vocab/med_vocab.pkl
    + vocab.txt (WordPiece vocab over the fixture corpus)."""
    rng = random.Random(seed)
    nrng = np.random.default_rng(seed)
    captions: List[str] = []
    for split, n, csv in (
        ("train", n_train, "traindata.csv"),
        ("validation", n_val, "valdata.csv"),
    ):
        img_dir = os.path.join(root, split, "radiology", "images")
        os.makedirs(img_dir, exist_ok=True)
        rows = []
        for i in range(n):
            name = f"ROCO_{split}_{i:04d}.jpg"
            _write_image(os.path.join(img_dir, name), nrng, image_size)
            cap = _caption(rng)
            captions.append(cap)
            # columns: id,name,caption,fr,de,es (back-translation columns
            # 3..5 as consumed by supcon_utils.py:237-244)
            rows.append(
                {
                    "id": f"ROCO_{i}",
                    "name": name,
                    "caption": cap,
                    "fr": cap + " fr",
                    "de": cap + " de",
                    "es": cap + " es",
                }
            )
        pd.DataFrame(rows).to_csv(
            os.path.join(root, split, "radiology", csv), index=False
        )
    os.makedirs(os.path.join(root, "vocab"), exist_ok=True)
    med = {f"ROCO_{i}": rng.sample(KEYWORDS, 2) for i in range(n_train)}
    with open(os.path.join(root, "vocab", "med_vocab.pkl"), "wb") as f:
        pickle.dump(med, f)
    _write_wordpiece_vocab(root, captions)
    return root


def make_vqa_fixture(
    root: str, n_per_cat: int = 4, seed: int = 0, image_size: int = 64
) -> str:
    """<root>/{traindf,valdf,testdf}.csv + {Train,Val,Test}/images."""
    rng = random.Random(seed)
    nrng = np.random.default_rng(seed)
    questions = []
    for split, mode in (("Train", "train"), ("Val", "val"), ("Test", "test")):
        img_dir = os.path.join(root, split, "images")
        os.makedirs(img_dir, exist_ok=True)
        rows = []
        for cat in CATEGORIES:
            for i in range(n_per_cat):
                img_id = f"synpic_{mode}_{cat}_{i}"
                _write_image(
                    os.path.join(img_dir, img_id + ".jpg"), nrng, image_size
                )
                q = f"what {cat} is shown in this {rng.choice(WORDS)} image"
                questions.append(q)
                rows.append(
                    {
                        "img_id": img_id,
                        "question": q,
                        "answer": rng.choice(ANSWERS[cat]),
                        "category": cat,
                        "mode": mode,
                    }
                )
        name = {"train": "traindf", "val": "valdf", "test": "testdf"}[mode]
        pd.DataFrame(rows).to_csv(os.path.join(root, f"{name}.csv"), index=False)
    _write_wordpiece_vocab(root, questions + [" ".join(WORDS)])
    return root


def _write_wordpiece_vocab(root: str, texts: List[str]) -> None:
    from mmvqa_tpu.data.tokenizer import build_vocab_from_corpus, write_vocab

    corpus = texts + [" ".join(WORDS), " ".join(KEYWORDS)]
    for answers in ANSWERS.values():
        corpus.append(" ".join(answers))
    vocab = build_vocab_from_corpus(corpus, max_size=4000)
    write_vocab(vocab, os.path.join(root, "vocab.txt"))
