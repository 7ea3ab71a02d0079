"""Evaluation metrics and artifact writers.

* exact-match accuracy, overall + per category (vqamed2019/utils.py:745-753);
* unigram BLEU via nltk.sentence_bleu(weights=[1]) between decoded answer
  strings (utils.py:328-330);
* prediction CSV and pipe-separated ImageCLEF submission file
  (eval.py:171-178).
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Sequence

import numpy as np
import pandas as pd

CATEGORIES = ("binary", "plane", "organ", "modality", "abnormality")


def bleu_score(
    preds: np.ndarray, targets: np.ndarray, idx2ans: Mapping[int, str]
) -> float:
    """nltk sentence_bleu, unigram weights (utils.py:328-330)."""
    from nltk.translate.bleu_score import sentence_bleu

    if len(preds) == 0:
        return float("nan")
    scores = [
        sentence_bleu(
            [idx2ans[int(t)].split()], idx2ans[int(p)].split(), weights=[1]
        )
        for p, t in zip(preds, targets)
    ]
    return float(np.mean(scores))


def per_category_accuracy(
    preds: np.ndarray,
    targets: np.ndarray,
    categories: Sequence[str],
    prefix: str = "",
) -> Dict[str, float]:
    cats = np.asarray(categories)
    acc = {f"{prefix}total_acc": float((preds == targets).mean() * 100.0)}
    for c in CATEGORIES:
        sel = cats == c
        key = "abnorm" if c == "abnormality" else c
        acc[f"{prefix}{key}_acc"] = float(
            (preds[sel] == targets[sel]).mean() * 100.0
        ) if sel.any() else float("nan")
    return {k: round(v, 4) for k, v in acc.items()}


def per_category_bleu(
    preds: np.ndarray,
    targets: np.ndarray,
    categories: Sequence[str],
    idx2ans: Mapping[int, str],
    prefix: str = "",
) -> Dict[str, float]:
    cats = np.asarray(categories)
    bleu = {f"{prefix}total_bleu": bleu_score(preds, targets, idx2ans)}
    for c in CATEGORIES:
        sel = cats == c
        key = "abnorm" if c == "abnormality" else c
        bleu[f"{prefix}{key}_bleu"] = bleu_score(
            preds[sel], targets[sel], idx2ans
        )
    return {k: round(v, 4) for k, v in bleu.items()}


def write_predictions(
    test_df: pd.DataFrame,
    preds: np.ndarray,
    idx2ans: Mapping[int, str],
    out_csv: str,
) -> pd.DataFrame:
    """<model>_preds.csv with decoded answers (eval.py:171-174)."""
    df = test_df.copy()
    df["preds"] = preds
    df["decode_preds"] = df["preds"].map(idx2ans)
    df["decode_ans"] = df["answer"].map(idx2ans)
    df.to_csv(out_csv, index=False)
    return df


def write_submission(
    test_df: pd.DataFrame,
    preds: np.ndarray,
    idx2ans: Mapping[int, str],
    out_txt: str,
) -> None:
    """ImageCLEF submission: ``img_id|answer`` rows (eval.py:176-178)."""
    img_ids = [
        os.path.basename(p).rsplit(".", 1)[0] for p in test_df["img_id"]
    ]
    decode = [idx2ans[int(p)] for p in preds]
    pd.DataFrame({"img_id": img_ids, "decode_preds": decode}).to_csv(
        out_txt, index=False, header=False, sep="|"
    )


def ensemble_logits(all_logits: Sequence[np.ndarray]) -> np.ndarray:
    """final_test averaging (utils.py:845-872): mean of per-model logits."""
    return np.mean(np.stack(all_logits), axis=0)
