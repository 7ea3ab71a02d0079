"""Threaded googletrans-protocol back-translation (en -> L -> en).

Rebuild of /root/reference/preprocess/translate.py:13-110 with the same
flag surface and run protocol:

* the dataframe splits into ``--chunk_size``-row chunks
  (split_dataframe, :13-18); ONE invocation processes exactly
  ``--num_threads`` chunks starting at chunk ``resume_pos //
  chunk_size`` — one thread per chunk (:99-107). Continuing the dataset
  means re-running with a higher ``--resume_pos`` (that windowing is the
  reference's resume protocol, not an accident of ours);
* per-caption translation goes en -> L -> en through the SAME web
  endpoint the ``googletrans`` library wraps
  (translate.googleapis.com/translate_a/single?client=gtx) — the
  library itself is just an HTTP client, so this module speaks the
  protocol directly via urllib with an injectable ``urlopen`` (tested
  offline against a fake; on this no-network rig every call fails and
  the sentinel path below is what executes);
* any per-caption error writes the ``--default`` sentinel ('not yet')
  into the column, exactly like translate_googletrans's try/except
  (:26-35) — failed rows are found and re-run later by resume passes;
* ``--resume`` re-reads traindata_<lang>.csv and prints the
  check_progress report (:20-24) — including the reference's hard-coded
  ``caption_fr`` column read, which KeyErrors for other languages
  (quirk preserved: resume for L != fr must pass the same column name
  the reference would have crashed on);
* output: the full dataframe with the ``caption_<lang>`` column ->
  traindata_<lang>.csv (:110).

Deviation (documented in PARITY.md): ``--method transformer`` in the
reference is BROKEN — it prints a warning, then starts threads whose
body references a never-constructed global ``transformer`` and dies on
NameError, silently writing an unchanged dataframe (:92-97 commented
out). Here it exits with a pointer to
``mmvqa_tpu.preprocess.translate_transformers`` (the working MarianMT
batch CLI) instead of reproducing the crash.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import threading
import urllib.parse
import urllib.request

import numpy as np
import pandas as pd

GTX_URL = "https://translate.googleapis.com/translate_a/single"


class GoogleWebTranslator:
    """Minimal client for the public gtx endpoint googletrans wraps.

    ``urlopen`` is injectable so the protocol is testable offline; the
    response format is the nested-list JSON the library parses: the
    translation is ``''.join(seg[0] for seg in payload[0])``.
    """

    def __init__(self, urlopen=urllib.request.urlopen, timeout: float = 10.0):
        self._urlopen = urlopen
        self._timeout = timeout

    def translate(self, text: str, src: str, dest: str) -> str:
        query = urllib.parse.urlencode({
            "client": "gtx", "sl": src, "tl": dest, "dt": "t", "q": text,
        })
        with self._urlopen(f"{GTX_URL}?{query}", timeout=self._timeout) as r:
            payload = json.loads(r.read().decode("utf-8"))
        return "".join(seg[0] for seg in payload[0] if seg and seg[0])

    def back_translate(self, text: str, dest: str) -> str:
        mid = self.translate(text, "en", dest)
        return self.translate(mid, dest, "en")


def split_dataframe(df: pd.DataFrame, chunk_size: int = 1000) -> list:
    """translate.py:13-18."""
    chunks = []
    num_chunks = math.ceil(df.shape[0] / chunk_size)
    for i in range(num_chunks):
        chunks.append(df[i * chunk_size:(i + 1) * chunk_size])
    return chunks


def check_progress(train_data: pd.DataFrame, resume_pos: int,
                   num_threads: int, chunk_size: int) -> None:
    """translate.py:20-24 restated — incl. the hard-coded 'caption_fr'."""
    before = train_data[
        (resume_pos - (num_threads * chunk_size)):resume_pos
    ].copy()
    before["result"] = np.where(
        before["caption"] == before["caption_fr"], 0, 1
    )
    counts = before["result"].value_counts()
    print("number of not changed == number processed??",
          counts.get(0, 0) == resume_pos)
    print("caption equals caption_fr",
          before["caption"].equals(before["caption_fr"]))


def main(argv=None, urlopen=None) -> None:
    p = argparse.ArgumentParser(description="translation")
    p.add_argument("--roco_dir", type=str, default="~/roco/train/radiology")
    p.add_argument("--language", type=str, required=True,
                   help="language to translate to for back translation")
    p.add_argument("--num_threads", type=int, default=25)
    p.add_argument("--chunk_size", type=int, default=1000,
                   help="chunk size of dataframe for each thread")
    p.add_argument("--default", type=str, default="not yet",
                   help="default to put in column")
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--resume_pos", type=int, default=0)
    p.add_argument("--method", type=str, default="googletrans",
                   choices=["googletrans", "transformer"])
    args = p.parse_args(argv)

    train_path = os.path.expanduser(args.roco_dir)
    default = args.default

    if args.resume and args.resume_pos == 0:
        print("Cant resume in pos 0")
        return
    if args.resume:
        train_data = pd.read_csv(
            os.path.join(train_path, f"traindata_{args.language}.csv")
        )
        check_progress(train_data, args.resume_pos, args.num_threads,
                       args.chunk_size)
    else:
        train_data = pd.read_csv(os.path.join(train_path, "traindata.csv"))
        train_data["caption_" + args.language] = default

    if args.method == "transformer":
        # the reference's threaded-transformer path is broken (see module
        # docstring); fail usefully instead of reproducing the NameError
        raise SystemExit(
            "method=transformer does not work threaded (reference "
            "translate.py:92-97); use "
            "python -m mmvqa_tpu.preprocess.translate_transformers"
        )

    chunks = split_dataframe(train_data, chunk_size=args.chunk_size)
    print("len chunks", len(chunks))
    print("chunk size", len(chunks[0]) if chunks else 0)

    translator = GoogleWebTranslator(
        urlopen=urlopen or urllib.request.urlopen
    )

    def back_translate_or_default(caption: str) -> str:
        try:
            return translator.back_translate(caption, args.language)
        except Exception as e:  # network down / quota / parse error
            print(str(e))
            return default

    col = "caption_" + args.language
    first_chunk = args.resume_pos // args.chunk_size

    def do_translate(t_num: int) -> None:
        print("my num", t_num)
        idx = first_chunk + t_num
        if idx >= len(chunks):
            return  # reference would IndexError past the last chunk
        df = chunks[idx]
        print("t_num, chunk_size", t_num, len(df))
        chunks[idx] = df.assign(
            **{col: [back_translate_or_default(c) for c in df["caption"]]}
        )

    threads = [
        threading.Thread(target=do_translate, args=(i,), daemon=True)
        for i in range(args.num_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    res = pd.concat(chunks)
    out = os.path.join(train_path, f"traindata_{args.language}.csv")
    res.to_csv(out, index=False, header=res.columns)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
