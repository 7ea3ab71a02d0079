"""Dataset loading: ROCO (pretrain) and VQA-Med 2019 (fine-tune).

On-disk layouts consumed are identical to the reference so existing data
directories work unchanged:

ROCO (pretrain/roco_utils.py:71-97, 545-587):
  <data_dir>/{train,validation}/radiology/images/<name>
  <data_dir>/{train,validation}/radiology/{traindata,valdata}.csv  (name,caption[,fr,de,es])
  <data_dir>/vocab/med_vocab.pkl  {roco_id: [keywords]}

VQA-Med 2019 (vqamed2019/utils.py:51-79):
  <data_dir>/{traindf,valdf,testdf}.csv  (img_id,question,answer,category,mode)
  <data_dir>/{Train,Val,Test}/images/<img_id>.jpg
"""

from __future__ import annotations

import os
import pickle
import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from mmvqa_tpu.core.config import Config
from mmvqa_tpu.data.images import load_image
from mmvqa_tpu.data.text_encoding import (
    encode_text_mlm,
    encode_text_vqa,
    flatten_keywords,
)
from mmvqa_tpu.data.tokenizer import WordPieceTokenizer

# hard-coded bad samples dropped by the reference (roco_train.py:70-72)
ROCO_BAD_IMAGES = (
    "PMC4345544_yjbm_88_1_93_g04.jpg",
    "PMC4240561_MA-68-291-g002.jpg",
    "PMC4093298_jadp-03-059-g02.jpg",
)


def _decode_image(cache, path: str, size: int) -> np.ndarray:
    """Decode via the optional cache (RamImageCache / DecodedImageCache) —
    the ONE place both datasets route decodes through."""
    if cache is not None:
        return cache.load(path, size)
    return load_image(path, size)


def get_keywords(data_dir: str) -> List[str]:
    """med_vocab.pkl -> flat keyword list (roco_utils.py:47-63)."""
    with open(os.path.join(data_dir, "vocab", "med_vocab.pkl"), "rb") as f:
        key = pickle.load(f)
    return flatten_keywords(key)


def load_mlm_data(cfg: Config) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """traindata/valdata CSVs filtered to images on disk (roco_utils.py:71-97),
    with the known-bad exclusions applied (roco_train.py:70-72)."""
    train_path = os.path.join(cfg.data_dir, "train", "radiology")
    val_path = os.path.join(cfg.data_dir, "validation", "radiology")
    train_names = set(os.listdir(os.path.join(train_path, "images")))
    val_names = set(os.listdir(os.path.join(val_path, "images")))
    train = pd.read_csv(os.path.join(train_path, "traindata.csv"))
    train = train[train["name"].isin(train_names)]
    val = pd.read_csv(os.path.join(val_path, "valdata.csv"))
    val = val[val["name"].isin(val_names)]
    for bad in ROCO_BAD_IMAGES:
        train = train[train["name"] != bad]
    train = train.reset_index(drop=True)
    if cfg.train_pct != 1.0:
        train = train.sample(frac=cfg.train_pct)
    if cfg.valid_pct != 1.0:
        val = val.sample(frac=cfg.valid_pct)
    return train.reset_index(drop=True), val.reset_index(drop=True)


def load_vqa_data(
    cfg: Config,
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """traindf/valdf/testdf with path mapping + lowercasing
    (vqamed2019/utils.py:51-79)."""
    dfs = []
    for split, sub in (("traindf", "Train"), ("valdf", "Val"), ("testdf", "Test")):
        df = pd.read_csv(os.path.join(cfg.data_dir, f"{split}.csv"))
        df["img_id"] = df["img_id"].apply(
            lambda x: os.path.join(cfg.data_dir, sub, "images", x + ".jpg")
        )
        df["category"] = df["category"].str.lower()
        df["answer"] = df["answer"].str.lower()
        dfs.append(df)
    train, val, test = dfs
    if cfg.train_pct != 1.0:
        train = train.sample(frac=cfg.train_pct)
    if cfg.valid_pct != 1.0:
        val = val.sample(frac=cfg.valid_pct)
    if cfg.test_pct != 1.0:
        test = test.sample(frac=cfg.test_pct)
    return (
        train.reset_index(drop=True),
        val.reset_index(drop=True),
        test.reset_index(drop=True),
    )


def build_answer_vocab(
    train: pd.DataFrame, val: pd.DataFrame, test: pd.DataFrame,
    category: Optional[str] = None,
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, Dict[int, str], int]:
    """Answer-id mapping over the train+val+test union in FIRST-SEEN order
    (train.py:101-110; pandas .unique() is insertion-ordered, which is what
    makes train- and eval-time vocabs line up in the reference)."""
    dfs = [train, val, test]
    if category:
        dfs = [
            d[d["category"] == category].reset_index(drop=True) for d in dfs
        ]
        dfs = [
            d[~d["answer"].isin(["yes", "no"])].reset_index(drop=True)
            for d in dfs
        ]
    df = pd.concat(dfs).reset_index(drop=True)
    ans2idx = {ans: idx for idx, ans in enumerate(df["answer"].unique())}
    idx2ans = {idx: ans for ans, idx in ans2idx.items()}
    df["answer"] = df["answer"].map(ans2idx).astype(int)
    train = df[df["mode"] == "train"].reset_index(drop=True)
    val = df[df["mode"] == "val"].reset_index(drop=True)
    test = df[df["mode"] == "test"].reset_index(drop=True)
    return train, val, test, idx2ans, len(ans2idx)


# ---------------------------------------------------------------------------
# indexable datasets producing fixed-shape numpy sample dicts
# ---------------------------------------------------------------------------

@dataclass
class ROCODataset:
    """(roco_utils.py:545-587). ``two_text_views=True`` adds the
    back-translated caption pick for SupCon (supcon_utils.py:219-244)."""

    cfg: Config
    df: pd.DataFrame
    tokenizer: WordPieceTokenizer
    keywords: Sequence[str]
    mode: str  # 'train' | 'validation'
    two_text_views: bool = False
    rotate_deg: float = 5.0  # host half of RandomRotation (train only)
    # optional decode cache (images.RamImageCache / DecodedImageCache) —
    # caches ONLY the deterministic decode half; rotation/masking stay
    # per-epoch random
    image_cache: Optional[object] = None
    _rows: np.ndarray = field(init=False)

    def __post_init__(self):
        self._rows = self.df.values
        self._keyset = set(self.keywords)
        self._rand = random.Random(self.cfg.seed)
        self._nprand = np.random.default_rng(self.cfg.seed)

    def __len__(self) -> int:
        return len(self._rows)

    def image_path(self, idx: int) -> str:
        name = self._rows[idx, 1]
        return os.path.join(
            self.cfg.data_dir, self.mode, "radiology", "images", name
        )

    def _teacher(self):
        """Lazy ClinicalBERT teacher for --task distillation
        (roco_utils.py:554-562); requires a LOCAL checkpoint."""
        if not hasattr(self, "_teacher_fn"):
            try:
                import torch
                from transformers import AutoModel

                model = AutoModel.from_pretrained(
                    self.cfg.clinicalbert, local_files_only=True
                ).eval()
            except Exception as e:
                raise RuntimeError(
                    "distillation needs a local ClinicalBERT checkpoint "
                    f"({self.cfg.clinicalbert}): {e}"
                ) from e

            def run(ids):
                with torch.no_grad():
                    t = torch.from_numpy(np.asarray(ids)).long()
                    return model(t, torch.ones_like(t)).last_hidden_state.numpy()

            self._teacher_fn = run
        return self._teacher_fn

    def _decode(self, idx: int) -> np.ndarray:
        return _decode_image(
            self.image_cache, self.image_path(idx), self.cfg.image_size
        )

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        img = self._decode(idx)
        if self.mode == "train":
            from mmvqa_tpu.data.images import random_rotate_host

            img = random_rotate_host(img, self.rotate_deg, self._nprand)
        caption = str(self._rows[idx, 2]).strip()
        if self.cfg.task == "distillation":
            from mmvqa_tpu.data.text_encoding import encode_text_distillation

            enc = encode_text_distillation(
                caption, self.tokenizer, self._teacher(), self.cfg.num_vis,
                self.cfg.max_position_embeddings, self.cfg.max_token_length,
            )
            return {
                "image": img,
                "tokens": enc.tokens,
                "segment_ids": enc.segment_ids,
                "input_mask": enc.input_mask,
                "labels": enc.labels,
            }
        enc = encode_text_mlm(
            caption, self.tokenizer, self._keyset, self.cfg.num_vis,
            self.cfg.max_position_embeddings, self.cfg.mlm_prob, self._rand,
        )
        out = {
            "image": img,
            "tokens": enc.tokens,
            "segment_ids": enc.segment_ids,
            "input_mask": enc.input_mask,
            "labels": enc.labels,
        }
        if self.two_text_views:
            # random back-translation column 3..5 (supcon_utils.py:237-244)
            col = self._rand.randint(3, 5)
            aug_caption = str(self._rows[idx, col]).strip()
            aug = encode_text_mlm(
                aug_caption, self.tokenizer, self._keyset, self.cfg.num_vis,
                self.cfg.max_position_embeddings, self.cfg.mlm_prob,
                self._rand,
            )
            out["aug_tokens"] = aug.tokens
            out["aug_labels"] = aug.labels
            out["caption"] = caption
            out["aug_caption"] = aug_caption
        return out


@dataclass
class VQADataset:
    """(vqamed2019/utils.py:215-257). Train mode adds the category id using
    first-seen category order (utils.py:227-229)."""

    cfg: Config
    df: pd.DataFrame
    tokenizer: WordPieceTokenizer
    mode: str  # 'train' | 'eval' | 'test'
    rotate_deg: float = 10.0  # host half of RandomRotation (train only)
    image_cache: Optional[object] = None  # decode cache (see ROCODataset)
    _cats2ans: Dict[str, int] = field(init=False, default_factory=dict)

    def __post_init__(self):
        self._nprand = np.random.default_rng(self.cfg.seed)
        if self.mode == "train":
            cats = self.df["category"].unique()
            self._cats2ans = {c: i for i, c in enumerate(cats)}

    def __len__(self) -> int:
        return len(self.df)

    @property
    def cats2ans(self) -> Dict[str, int]:
        return self._cats2ans

    def image_path(self, idx: int) -> str:
        return self.df.loc[idx, "img_id"]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        img = _decode_image(
            self.image_cache, self.image_path(idx), self.cfg.image_size
        )
        if self.mode == "train":
            from mmvqa_tpu.data.images import random_rotate_host

            img = random_rotate_host(img, self.rotate_deg, self._nprand)
        enc = encode_text_vqa(
            str(self.df.loc[idx, "question"]), self.tokenizer,
            self.cfg.max_position_embeddings,
        )
        out = {
            "image": img,
            "tokens": enc.tokens,
            "segment_ids": enc.segment_ids,
            "input_mask": enc.input_mask,
            "answer": np.asarray(self.df.loc[idx, "answer"], np.int32),
        }
        if self.mode == "train":
            out["category"] = np.asarray(
                self._cats2ans[self.df.loc[idx, "category"]], np.int32
            )
        return out
