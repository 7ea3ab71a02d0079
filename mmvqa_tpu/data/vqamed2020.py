"""VQA-Med 2020 auxiliary data paths (vqamed2019/utils.py:81-147, 260-324).

* ``load_2020_data``: 2020 train/val CSVs with the hard-coded bad-image
  exclusions, yes/no filtered out, merged with re-labeled 2019 data whose
  answers appear in the 2020 class set; answer + keyword vocabularies built
  over train+val (utils.py:81-147).
* ``VQAMedBinary``: binary yes/no dataset variant (utils.py:260-324).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np
import pandas as pd

from mmvqa_tpu.core.config import Config
from mmvqa_tpu.data.datasets import load_vqa_data
from mmvqa_tpu.data.images import load_image
from mmvqa_tpu.data.text_encoding import encode_text_vqa
from mmvqa_tpu.data.tokenizer import WordPieceTokenizer

REMOVE_TRAIN2020 = (
    "synpic52595", "synpic61281", "synpic43628", "synpic15348",
    "synpic35145", "synpic20101", "synpic20412", "synpic45126",
    "synpic26398", "synpic15349", "synpic37214", "synpic52598",
    "synpic46660", "synpic36320", "synpic34054", "synpic58686",
    "synpic15888", "synpic19909", "synpic24243", "synpic39311",
    "synpic18484", "synpic24871", "synpic31586", "synpic47242",
    "synpic36969", "synpic21626", "synpic22983", "synpic40377",
    "synpic48870", "synpic43583", "synpic45128", "synpic32198",
    "synpic31080", "synpic45115", "synpic28125", "synpic45123",
    "synpic23844", "synpic17714", "synpic52608", "synpic52601",
    "synpic47246", "synpic15351", "synpic46658", "synpic45039",
    "synpic31101", "synpic52611", "synpic31083", "synpic49269",
    "synpic23197", "synpic27940", "synpic37880",
)
REMOVE_VAL2020 = (
    "synpic48867", "synpic22792", "synpic20410", "synpic52301",
    "synpic52606", "synpic41310", "synpic21537", "synpic28001",
    "synpic21967", "synpic45120", "synpic45129", "synpic30873",
    "synpic20402",
)
REMOVE_TRAIN2019 = (
    "synpic21456", "synpic21845", "synpic47995", "synpic48869",
    "synpic52613", "synpic31716", "synpic27917", "synpic39365",
    "synpic19434", "synpic52600", "synpic56649", "synpic52603",
    "synpic52610", "synpic46659", "synpic19533",
)


def load_2020_data(
    cfg: Config, datapath2020: str, testpath: str = ""
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, Dict[int, str], int]:
    """(utils.py:81-147). Returns (train, val, test, idx2ans, num_classes)."""
    trainset = os.path.join(datapath2020, "VQAMed2020-VQAnswering-TrainingSet")
    traindf = pd.read_csv(os.path.join(trainset, "train.csv"))
    traindf = traindf[~traindf["imgid"].isin(REMOVE_TRAIN2020)]
    traindf = traindf[~traindf["answer"].isin(["yes", "no"])].reset_index(drop=True)
    valdf = pd.read_csv(os.path.join(trainset, "val.csv"))
    valdf = valdf[~valdf["imgid"].isin(REMOVE_VAL2020)]
    valdf = valdf[~valdf["answer"].isin(["yes", "no"])].reset_index(drop=True)
    testdf = pd.read_csv(os.path.join(trainset, "test.csv"))

    traindf["imgid"] = traindf["imgid"].apply(
        lambda x: os.path.join(
            trainset, "VQAnswering_2020_Train_images", x + "_224.jpg"
        )
    )
    valdf["imgid"] = valdf["imgid"].apply(
        lambda x: os.path.join(
            datapath2020, "VQAMed2020-VQAnswering-ValidationSet",
            "VQAnswering_2020_Val_images", x + "_224.jpg",
        )
    )
    if testpath:
        testdf["imgid"] = testdf["imgid"].apply(
            lambda x: os.path.join(
                testpath, "Task1-2020-VQAnswering-Test-Images", x + "_224.jpg"
            )
        )

    classes2020 = list(
        set(list(traindf["answer"].unique()) + list(valdf["answer"].unique()))
    )

    # merge 2019 data re-labeled with keyword 'abnorm' (utils.py:112-123)
    t19, v19, s19 = load_vqa_data(cfg.replace(train_pct=1.0, valid_pct=1.0,
                                              test_pct=1.0))
    df2019 = pd.concat([t19, v19, s19])
    df2019 = df2019[
        ~df2019["img_id"].apply(
            lambda p: os.path.basename(p).split(".")[0]
        ).isin(REMOVE_TRAIN2019)
    ]
    df2019 = df2019.drop(["category", "mode"], axis=1)
    df2019["keyword"] = "abnorm"
    df2019 = df2019[df2019["answer"].isin(classes2020)].reset_index(drop=True)
    df2019.columns = ["imgid", "question", "answer", "keyword"]
    traindf = pd.concat([traindf, df2019]).reset_index(drop=True)

    df = pd.concat([traindf, valdf], ignore_index=True)
    ans2idx = {a: i for i, a in enumerate(sorted(df["answer"].unique()))}
    idx2ans = {i: a for a, i in ans2idx.items()}
    key2idx = {k: i for i, k in enumerate(sorted(df["keyword"].unique()))}
    traindf["answer"] = traindf["answer"].map(ans2idx)
    valdf["answer"] = valdf["answer"].map(ans2idx)
    traindf["keyword"] = traindf["keyword"].map(key2idx)
    valdf["keyword"] = valdf["keyword"].map(key2idx)
    if "keyword" in testdf:
        testdf["keyword"] = testdf["keyword"].map(key2idx)
    return traindf, valdf, testdf, idx2ans, len(ans2idx)


@dataclass
class VQAMed2020Dataset:
    """imgid/question/answer[/keyword] rows (column layout of the 2020 CSVs)."""

    cfg: Config
    df: pd.DataFrame
    tokenizer: WordPieceTokenizer
    mode: str = "train"  # 'train' | 'eval' | 'test'

    def __len__(self):
        return len(self.df)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.df.loc[idx]
        img = load_image(row["imgid"], self.cfg.image_size)
        enc = encode_text_vqa(
            str(row["question"]), self.tokenizer,
            self.cfg.max_position_embeddings,
        )
        out = {
            "image": img,
            "tokens": enc.tokens,
            "segment_ids": enc.segment_ids,
            "input_mask": enc.input_mask,
        }
        if self.mode != "test":
            out["answer"] = np.asarray(row["answer"], np.int32)
        if "keyword" in row:
            out["keyword"] = np.asarray(row["keyword"], np.int32)
        return out


@dataclass
class VQAMedBinary:
    """Binary yes/no variant (utils.py:260-324): same sample layout as
    VQADataset but over a yes/no-only dataframe with 2 classes."""

    cfg: Config
    df: pd.DataFrame
    tokenizer: WordPieceTokenizer
    mode: str = "train"

    def __post_init__(self):
        self.df = self.df[self.df["answer"].isin([0, 1]) |
                          self.df["answer"].isin(["yes", "no"])].reset_index(
            drop=True
        )
        if not pd.api.types.is_integer_dtype(self.df["answer"]):
            self.df["answer"] = (self.df["answer"] == "yes").astype(int)

    def __len__(self):
        return len(self.df)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.df.loc[idx]
        img = load_image(row["img_id"], self.cfg.image_size)
        enc = encode_text_vqa(
            str(row["question"]), self.tokenizer,
            self.cfg.max_position_embeddings,
        )
        return {
            "image": img,
            "tokens": enc.tokens,
            "segment_ids": enc.segment_ids,
            "input_mask": enc.input_mask,
            "answer": np.asarray(row["answer"], np.int32),
        }
