"""Per-category label-smoothing table (LabelSmoothByCategory host half).

The reference precomputes, per question category, a smoothing vector that
spreads ``smoothing`` mass uniformly over the answers occurring in that
category in the training set (vqamed2019/utils.py:1266-1293), then sets the
true answer's entry to ``1 - smoothing`` per sample (:1247-1256). Here the
per-category vectors are stacked into one (n_categories, num_classes) array
indexed by the dataset's category ids; the device half lives in
mmvqa_tpu.train.steps.make_vqa_steps.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd


def build_category_smoothing_table(
    train_df: pd.DataFrame,
    num_classes: int,
    cats2ans: Dict[str, int],
    smoothing: float = 0.1,
) -> np.ndarray:
    table = np.zeros((len(cats2ans), num_classes), np.float32)
    for cat, row in cats2ans.items():
        idx = train_df[train_df["category"] == cat]["answer"].unique()
        if len(idx):
            table[row, np.asarray(idx, int)] = smoothing / len(idx)
    return table
