"""VQA-Med 2020 data path: synthetic 2020 layout + 2019 merge -> loader."""

import os

import numpy as np
import pandas as pd
import pytest

from mmvqa_tpu.core.config import vqa_config
from mmvqa_tpu.data.fixtures import make_vqa_fixture
from mmvqa_tpu.data.tokenizer import WordPieceTokenizer
from mmvqa_tpu.data.vqamed2020 import (
    REMOVE_TRAIN2020,
    VQAMed2020Dataset,
    load_2020_data,
)


@pytest.fixture()
def data_dirs(tmp_path, rng):
    # 2019 fixture (merged into 2020 train, utils.py:112-123)
    clef2019 = make_vqa_fixture(str(tmp_path / "clef2019"), n_per_cat=3)

    root2020 = str(tmp_path / "vqa2020")
    trainset = os.path.join(root2020, "VQAMed2020-VQAnswering-TrainingSet")
    img_dir = os.path.join(trainset, "VQAnswering_2020_Train_images")
    os.makedirs(img_dir, exist_ok=True)
    val_img_dir = os.path.join(
        root2020, "VQAMed2020-VQAnswering-ValidationSet",
        "VQAnswering_2020_Val_images",
    )
    os.makedirs(val_img_dir, exist_ok=True)

    from PIL import Image

    def write_csv(name, ids, answers):
        pd.DataFrame({
            "imgid": ids,
            "question": [f"what abnormality {i}" for i in ids],
            "answer": answers,
            "keyword": ["abnorm"] * len(ids),
        }).to_csv(os.path.join(trainset, name), index=False)

    train_ids = ["synpicA", "synpicB", REMOVE_TRAIN2020[0], "synpicC"]
    write_csv("train.csv", train_ids, ["cyst", "yes", "cyst", "mass"])
    write_csv("val.csv", ["synpicD"], ["mass"])
    write_csv("test.csv", ["synpicE"], ["cyst"])

    arr = np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    for i in ("synpicA", "synpicB", "synpicC"):
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}_224.jpg"))
    Image.fromarray(arr).save(os.path.join(val_img_dir, "synpicD_224.jpg"))
    return clef2019, root2020


def test_load_2020_data_merge_and_filters(data_dirs):
    clef2019, root2020 = data_dirs
    cfg = vqa_config(data_dir=clef2019, image_size=32,
                     max_position_embeddings=20)
    train, val, test, idx2ans, n = load_2020_data(cfg, root2020)
    # bad image + yes/no filtered from the 2020 rows
    names = [os.path.basename(p) for p in train["imgid"]]
    assert not any(REMOVE_TRAIN2020[0] in p for p in names)
    assert "yes" not in idx2ans.values() and "no" not in idx2ans.values()
    # merged 2019 rows restricted to answers present in the 2020 class set
    answers_2020 = {"cyst", "mass"}
    assert set(idx2ans.values()) <= answers_2020 | set()
    # keyword vocabulary applied
    assert train["keyword"].notna().all()
    assert n == len(idx2ans)

    tok = WordPieceTokenizer.find_and_load(data_dir=clef2019)
    ds = VQAMed2020Dataset(cfg, train.reset_index(drop=True), tok, "train")
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["tokens"].shape == (20,)
    assert "keyword" in s and "answer" in s
