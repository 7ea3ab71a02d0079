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


# ---------------------------------------------------------------------------
# back-translation CLIs (round 4): the googletrans PROTOCOL driver
# (preprocess/translate.py) tested offline via an injected urlopen, and the
# MarianMT batch CLI (preprocess/translate_transformers.py) via a stub
# translator
# ---------------------------------------------------------------------------

class _FakeGtxResponse:
    def __init__(self, payload):
        self._payload = payload

    def read(self):
        import json

        return json.dumps(self._payload).encode("utf-8")

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _fake_urlopen_factory(log):
    """Round-trippable fake of translate.googleapis.com/translate_a/single:
    en->L prefixes '<L>:', L->en strips it — so a successful round trip
    returns the original caption and the call sequence is checkable."""
    from urllib.parse import parse_qs, urlparse

    def fake_urlopen(url, timeout=None):
        q = parse_qs(urlparse(url).query)
        text, sl, tl = q["q"][0], q["sl"][0], q["tl"][0]
        log.append((sl, tl, text))
        if sl == "en":
            out = f"{tl}:{text}"
        else:
            out = text.split(":", 1)[1]
        # gtx nested-list payload: [[ [trans, orig, ...], ... ], ...]
        return _FakeGtxResponse([[[out, text, None, None, 10]], None, sl])

    return fake_urlopen


def _translate_tree(tmp_path, n=5):
    d = str(tmp_path / "radiology")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({
        "name": [f"img{i}.jpg" for i in range(n)],
        "caption": [f"caption number {i}" for i in range(n)],
    }).to_csv(os.path.join(d, "traindata.csv"), index=False)
    return d


def test_googletrans_backtranslation_roundtrip_and_window(tmp_path):
    """One invocation processes exactly num_threads chunks starting at
    resume_pos // chunk_size (reference translate.py:99-107); everything
    else keeps the --default sentinel."""
    from mmvqa_tpu.preprocess.translate import main

    d = _translate_tree(tmp_path, n=5)
    log = []
    main(["--roco_dir", d, "--language", "fr", "--num_threads", "1",
          "--chunk_size", "2"], urlopen=_fake_urlopen_factory(log))

    out = pd.read_csv(os.path.join(d, "traindata_fr.csv"))
    assert list(out.columns) == ["name", "caption", "caption_fr"]
    # chunk 0 (rows 0-1) back-translated; the fake round-trips exactly
    assert list(out["caption_fr"][:2]) == list(out["caption"][:2])
    # rows past the num_threads-chunk window keep the sentinel
    assert all(v == "not yet" for v in out["caption_fr"][2:])
    # call sequence: en->fr then fr->en per caption
    assert log[0][:2] == ("en", "fr") and log[1][:2] == ("fr", "en")
    assert len(log) == 4


def test_googletrans_error_writes_default_sentinel(tmp_path):
    """Per-caption failures write --default, like translate_googletrans's
    try/except (reference translate.py:26-35) — offline, EVERY call fails
    and the run still completes."""
    from mmvqa_tpu.preprocess.translate import main

    d = _translate_tree(tmp_path, n=3)

    def dead_urlopen(url, timeout=None):
        raise OSError("network unreachable")

    main(["--roco_dir", d, "--language", "fr", "--num_threads", "2",
          "--chunk_size", "2", "--default", "failed"],
         urlopen=dead_urlopen)
    out = pd.read_csv(os.path.join(d, "traindata_fr.csv"))
    assert all(v == "failed" for v in out["caption_fr"])


def test_googletrans_resume_continues_window(tmp_path, capsys):
    """--resume re-reads traindata_<lang>.csv, prints the check_progress
    report, and translates the NEXT window while preserving earlier rows."""
    from mmvqa_tpu.preprocess.translate import main

    d = _translate_tree(tmp_path, n=6)
    log = []
    fake = _fake_urlopen_factory(log)
    main(["--roco_dir", d, "--language", "fr", "--num_threads", "1",
          "--chunk_size", "2"], urlopen=fake)
    main(["--roco_dir", d, "--language", "fr", "--num_threads", "1",
          "--chunk_size", "2", "--resume", "--resume_pos", "2"],
         urlopen=fake)
    out = pd.read_csv(os.path.join(d, "traindata_fr.csv"))
    assert list(out["caption_fr"][:4]) == list(out["caption"][:4])
    assert all(v == "not yet" for v in out["caption_fr"][4:])
    assert "number of not changed == number processed??" in capsys.readouterr().out


def test_googletrans_resume_pos_zero_refuses(tmp_path, capsys):
    from mmvqa_tpu.preprocess.translate import main

    d = _translate_tree(tmp_path, n=2)
    main(["--roco_dir", d, "--language", "fr", "--resume"])
    assert "Cant resume in pos 0" in capsys.readouterr().out
    assert not os.path.exists(os.path.join(d, "traindata_fr.csv"))


def test_translate_transformers_output_joins(tmp_path):
    """The MarianMT batch CLI writes caption_<lang>.csv with [id,
    caption_<lang>] (reference translate_transformers.py:90-104), which
    build_from_translation joins."""
    from mmvqa_tpu.preprocess.build_from_translation import main as join_main
    from mmvqa_tpu.preprocess.translate_transformers import main

    d = _translate_tree(tmp_path, n=5)
    calls = []

    def stub_translator(texts):
        calls.append(list(texts))
        return [f"bt({t})" for t in texts]

    main(["--roco_dir", d, "--language", "fr", "--batch_size", "2"],
         translator=stub_translator)
    out = pd.read_csv(os.path.join(d, "caption_fr.csv"))
    assert list(out.columns) == ["id", "caption_fr"]
    assert len(out) == 5 and out["caption_fr"].iloc[0].startswith("bt(")
    assert [len(c) for c in calls] == [2, 2, 1]

    join_main(["--roco_dir", d, "--languages", "fr"])
    joined = pd.read_csv(os.path.join(d, "traindata_translated.csv"))
    assert joined["caption_fr"].iloc[4] == "bt(caption number 4)"
