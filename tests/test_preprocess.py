"""Preprocess ETL round-trips: synthetic RAW dataset files -> preprocess CLIs
-> the exact CSV/pickle artifacts the training loaders consume."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def raw_roco(tmp_path):
    """Raw ROCO layout: licences.txt + captions.txt + keywords.txt per split
    (consumed by preprocess/roco_data.py:12-61)."""
    root = str(tmp_path / "roco")
    for split in ("train", "validation"):
        d = os.path.join(root, split)
        os.makedirs(os.path.join(d, "radiology", "images"), exist_ok=True)
        os.makedirs(d, exist_ok=True)
        ids = [f"ROCO_{split}_{i:03d}" for i in range(4)]
        pd.DataFrame({
            "ROCO_ID": ids,
            "name": [f"{r}.jpg" for r in ids],
            "licence": ["CC"] * 4,
        }).to_csv(os.path.join(d, "licences.txt"), index=False)
        with open(os.path.join(d, "captions.txt"), "w") as f:
            for r in ids:
                f.write(f"{r}\tchest x ray shows pneumonia in {r}\n")
        with open(os.path.join(d, "keywords.txt"), "w") as f:
            for r in ids:
                f.write(f"{r}\tpneumonia\tchest\n")
    return root


def test_roco_data_dataframe_and_vocab(raw_roco):
    from mmvqa_tpu.preprocess.roco_data import main

    main(["--task", "dataframe", "--roco_dir", raw_roco])
    train = pd.read_csv(os.path.join(raw_roco, "train", "traindata.csv"))
    assert list(train.columns) == ["name", "caption"]
    assert len(train) == 4 and train["name"].iloc[0].endswith(".jpg")

    main(["--task", "vocab", "--roco_dir", raw_roco])
    with open(os.path.join(raw_roco, "vocab", "med_vocab.pkl"), "rb") as f:
        vocab = pickle.load(f)
    assert vocab["ROCO_train_000"] == ["pneumonia", "chest"]
    # consumable by the training-side keyword loader
    from mmvqa_tpu.data.text_encoding import flatten_keywords

    flat = flatten_keywords(vocab)
    assert "pneumonia" in flat and "chest" in flat


@pytest.fixture()
def raw_vqa(tmp_path):
    """Raw VQA-Med 2019 layout: QAPairsByCategory/*.txt + test Q&A file
    (consumed by preprocess/vqamed2019_data.py)."""
    root = str(tmp_path / "clef")
    for split, mode in (("Train", "train"), ("Val", "val")):
        d = os.path.join(root, split, "QAPairsByCategory")
        os.makedirs(d, exist_ok=True)
        for cat in ("Modality", "Organ"):
            with open(os.path.join(d, f"C1_{cat}_{mode}.txt"), "w") as f:
                f.write(f"img1|what {cat.lower()} is this|ct\n")
                f.write(f"img2|is this a scan|yes\n")
    os.makedirs(os.path.join(root, "Test"), exist_ok=True)
    with open(os.path.join(root, "Test", "test_questions&answers.txt"), "w") as f:
        f.write("img9|organ|what organ|lung\n")
        f.write("img8|modality|is this mri|no\n")
    return root


def test_vqamed2019_data_roundtrip(raw_vqa):
    from mmvqa_tpu.preprocess.vqamed2019_data import main

    main(["--data_dir", raw_vqa])
    for name in ("traindf.csv", "valdf.csv", "testdf.csv"):
        assert os.path.exists(os.path.join(raw_vqa, name)), name
    train = pd.read_csv(os.path.join(raw_vqa, "traindf.csv"))
    # yes/no re-categorized binary (vqamed2019_data.py:22-24)
    assert set(train["category"]) == {"modality", "organ", "binary"}
    test = pd.read_csv(os.path.join(raw_vqa, "testdf.csv"))
    assert (test[test["answer"] == "no"]["category"] == "binary").all()

    # consumable by load_vqa_data after adding images
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("Train", "Val", "Test"):
        d = os.path.join(raw_vqa, split, "images")
        os.makedirs(d, exist_ok=True)
        df = pd.read_csv(os.path.join(
            raw_vqa, {"Train": "traindf", "Val": "valdf", "Test": "testdf"}[split]
            + ".csv"))
        for img_id in df["img_id"].unique():
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(os.path.join(d, f"{img_id}.jpg"))

    from mmvqa_tpu.core.config import vqa_config
    from mmvqa_tpu.data.datasets import build_answer_vocab, load_vqa_data

    cfg = vqa_config(data_dir=raw_vqa)
    tr, va, te = load_vqa_data(cfg)
    tr, va, te, idx2ans, n = build_answer_vocab(tr, va, te)
    assert n >= 3 and len(te) == 2


def test_build_from_translation(tmp_path):
    from mmvqa_tpu.preprocess.build_from_translation import main

    d = str(tmp_path / "radiology")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({
        "name": ["a.jpg", "b.jpg"],
        "caption": ["one", "two"],
    }).to_csv(os.path.join(d, "traindata.csv"), index=False)
    for lang in ("fr", "de"):
        pd.DataFrame({f"caption_{lang}": [f"one {lang}", f"two {lang}"]}).to_csv(
            os.path.join(d, f"caption_{lang}.csv"), index=False
        )
    main(["--roco_dir", d, "--languages", "fr", "de"])
    out = pd.read_csv(os.path.join(d, "traindata_translated.csv"))
    assert list(out.columns) == ["name", "caption", "caption_fr", "caption_de"]
    assert out["caption_fr"].iloc[1] == "two fr"
