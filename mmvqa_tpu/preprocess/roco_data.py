"""ROCO offline ETL: dataframes, keyword vocab, sorted keywords.

CLI-compatible rebuild of preprocess/roco_data.py:
* --task dataframe: merge licences.txt + captions.txt -> traindata/valdata.csv
  (:12-28);
* --task vocab: keywords.txt (train+validation) -> vocab/med_vocab.pkl
  {roco_id: [keywords]} (:35-61, 116-122);
* --task sort_keywords: keyword-sorted csv (:67-100).
"""

from __future__ import annotations

import argparse
import os
import pickle

import pandas as pd


def build_dataframe(roco_path: str, split: str) -> pd.DataFrame:
    licences = pd.read_csv(os.path.join(roco_path, split, "licences.txt"))
    captions = pd.read_csv(
        os.path.join(roco_path, split, "captions.txt"),
        sep="\t", names=["ROCO_ID", "caption"], header=None,
    )
    result = pd.merge(licences, captions, on="ROCO_ID")
    df = result[["name", "caption"]]
    filename = "traindata.csv" if split == "train" else "valdata.csv"
    df.to_csv(
        os.path.join(roco_path, split, filename), index=False,
        header=["name", "caption"],
    )
    return df


def count_keywords(roco_path: str, split: str, keywords: dict) -> dict:
    with open(os.path.join(roco_path, split, "keywords.txt")) as f:
        for line in f:
            parts = line.split("\t")
            roco_id = parts[0]
            keywords[roco_id] = [k.strip() for k in parts[1:] if k.strip()]
    return keywords


def sort_keywords(roco_path: str) -> pd.DataFrame:
    kw_path = os.path.join(roco_path, "train")
    kdf = pd.read_csv(
        os.path.join(kw_path, "keywords.txt"), sep="\t\t",
        names=("id", "keys"), engine="python",
    )
    traindata = pd.read_csv(os.path.join(kw_path, "traindata.csv"))
    rows = []
    for rid, keys in zip(kdf["id"], kdf["keys"]):
        if keys is None or (isinstance(keys, float)):
            continue
        ks = str(keys).split("\t")
        rows.append({
            "id": rid,
            "keys": " ".join(ks),
            "sorted_keys": "".join(sorted(ks)),
        })
    df = pd.DataFrame(rows)
    res = pd.merge(df, traindata, on="id")
    res = res.drop("caption", axis=1).sort_values("sorted_keys")
    res.to_csv(
        os.path.join(kw_path, "keywords_sorted_name.csv"), index=False,
        header=("id", "keys", "sorted_keys", "name"),
    )
    return res


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="preprocess roco tasks")
    p.add_argument("--task", type=str,
                   choices=["dataframe", "vocab", "sort_keywords"],
                   required=True)
    p.add_argument("--roco_dir", type=str, default="roco")
    args = p.parse_args(argv)

    if args.task == "dataframe":
        build_dataframe(args.roco_dir, "train")
        build_dataframe(args.roco_dir, "validation")
    elif args.task == "vocab":
        keywords: dict = {}
        keywords = count_keywords(args.roco_dir, "train", keywords)
        keywords = count_keywords(args.roco_dir, "validation", keywords)
        print("len", len(keywords))
        os.makedirs(os.path.join(args.roco_dir, "vocab"), exist_ok=True)
        with open(
            os.path.join(args.roco_dir, "vocab", "med_vocab.pkl"), "wb"
        ) as fp:
            pickle.dump(keywords, fp)
    elif args.task == "sort_keywords":
        sort_keywords(args.roco_dir)


if __name__ == "__main__":
    main()
