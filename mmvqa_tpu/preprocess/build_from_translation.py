"""Join per-language back-translation CSVs into traindata_translated.csv.

CLI rebuild of preprocess/build_from_translation.py:12-19.
"""

from __future__ import annotations

import argparse
import os

import pandas as pd


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="building dataframe")
    p.add_argument("--roco_dir", type=str, default="~/roco/train/radiology")
    p.add_argument("--languages", nargs="+", required=True)
    args = p.parse_args(argv)

    path = os.path.expanduser(args.roco_dir)
    train_data = pd.read_csv(os.path.join(path, "traindata.csv"))
    for lang in args.languages:
        cap = pd.read_csv(os.path.join(path, f"caption_{lang}.csv"))
        train_data[f"caption_{lang}"] = cap[f"caption_{lang}"]
    out = os.path.join(path, "traindata_translated.csv")
    train_data.to_csv(out, index=False, header=train_data.columns)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
