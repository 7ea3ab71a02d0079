"""VQA-Med 2019 ETL: QAPairsByCategory/*.txt -> traindf/valdf/testdf.csv.

CLI rebuild of preprocess/vqamed2019_data.py: pipe-separated category files
parsed per split, yes/no answers re-categorized as 'binary' (:22-24,33-34).
The CSVs are written where the trainers read them (<data_dir>/traindf.csv,
vqamed2019/utils.py:53-55) — the reference writes them into the split
subdirectories and relies on a manual move.
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

COLS = ["img_id", "question", "answer", "mode", "category"]


def create_df(d_dir: str, mode: str) -> pd.DataFrame:
    res = []
    for f in sorted(os.listdir(os.path.join(d_dir, "QAPairsByCategory"))):
        category = f.split("_")[1].lower()
        df = pd.read_csv(
            os.path.join(d_dir, "QAPairsByCategory", f), sep="|",
            names=["img_id", "question", "answer"],
        )
        df["mode"] = mode
        df["category"] = category
        df.loc[df.answer == "no", "category"] = "binary"
        df.loc[df.answer == "yes", "category"] = "binary"
        res.append(df)
    return pd.concat(res)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="preprocess VQA-Med 2019")
    p.add_argument("--data_dir", type=str, default="ImageClef-2019-VQA-Med")
    args = p.parse_args(argv)

    train_df = create_df(os.path.join(args.data_dir, "Train"), "train")
    val_df = create_df(os.path.join(args.data_dir, "Val"), "val")
    test_df = pd.read_csv(
        os.path.join(args.data_dir, "Test", "test_questions&answers.txt"),
        sep="|", names=["img_id", "category", "question", "answer"],
    )
    test_df.loc[test_df.answer == "no", "category"] = "binary"
    test_df.loc[test_df.answer == "yes", "category"] = "binary"
    test_df["mode"] = "test"

    cols = train_df.columns.tolist()
    train_df.to_csv(os.path.join(args.data_dir, "traindf.csv"), index=False,
                    columns=cols)
    val_df.to_csv(os.path.join(args.data_dir, "valdf.csv"), index=False,
                  columns=cols)
    test_df[cols].to_csv(os.path.join(args.data_dir, "testdf.csv"),
                         index=False, columns=cols)
    print(f"train {len(train_df)} / val {len(val_df)} / test {len(test_df)}")


if __name__ == "__main__":
    main()
