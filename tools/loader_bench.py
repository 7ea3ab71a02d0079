"""Host input-pipeline throughput: can BatchLoader feed the device step?

VERDICT r2 #5: the device step runs at ~900 img/s/chip, so the threaded
Python loader (data/loader.py — PIL decode + host rotate + tokenize per
sample) must sustain that rate or the epoch throughput is host-bound.
This tool measures the loader ALONE (no device) over a full-size synthetic
ROCO tree, sweeping num_workers, plus the --cache_images warm path.

Usage:
  python -m mmvqa_tpu.cli.make_fixtures --out /tmp/bigfix --n_train 5120 \
      --image_size 224
  python tools/loader_bench.py --data_dir /tmp/bigfix/roco \
      [--workers 4 8 16 32] [--batches 30]

Replaces: torch DataLoader(num_workers) tuning (roco_train.py:126-127).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--workers", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--batches", type=int, default=30,
                    help="timed batches per config (after 3 warmup)")
    ap.add_argument("--cache", action="store_true", default=False,
                    help="also time a second (warm) epoch with --cache_images")
    ap.add_argument("--image_cache_dir", default="",
                    help="also time the persistent disk-backed decode cache "
                         "(build epoch + fresh-process cold epoch)")
    args = ap.parse_args()

    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.data import (
        BatchLoader,
        ROCODataset,
        get_keywords,
        load_mlm_data,
    )
    from mmvqa_tpu.data.tokenizer import WordPieceTokenizer

    cfg = pretrain_config(data_dir=args.data_dir, batch_size=args.batch_size)
    tok = WordPieceTokenizer.find_and_load(cfg.data_dir, "")
    cfg = cfg.replace(vocab_size=tok.vocab_size)
    train_df, _ = load_mlm_data(cfg)
    keywords = get_keywords(cfg.data_dir)
    ds = ROCODataset(cfg, train_df, tok, keywords, "train")
    print(f"dataset: {len(ds)} samples, batch {args.batch_size}")

    def time_epochs(loader, n_epochs=1, full=False):
        """full=True consumes complete epochs (required for cache timing:
        breaking early leaves the cache partially filled and the 'warm'
        epoch half-cold — the round-3 bug that first reported 757 img/s
        warm when the true warm rate is ~7.5k)."""
        rates = []
        for _ in range(n_epochs):
            it = iter(loader)
            for _ in range(3):  # warmup: fill prefetch queue
                next(it)
            t0 = time.time()
            n = 0
            for b in it:
                n += 1
                if not full and n >= args.batches:
                    break
            dt = time.time() - t0
            rates.append(n * args.batch_size / dt)
        return rates

    for w in args.workers:
        loader = BatchLoader(
            ds, args.batch_size, shuffle=True, num_workers=w, drop_last=True
        )
        (rate,) = time_epochs(loader)
        print(json.dumps({"num_workers": w,
                          "host_img_per_sec": round(rate, 1)}), flush=True)

    if args.cache:
        loader = BatchLoader(
            ds, args.batch_size, shuffle=True, num_workers=args.workers[-1],
            drop_last=True, cache_images=True,
        )
        cold, warm = time_epochs(loader, n_epochs=2, full=True)
        print(json.dumps({"cache_images": True,
                          "cold_img_per_sec": round(cold, 1),
                          "warm_img_per_sec": round(warm, 1)}), flush=True)

    if args.image_cache_dir:
        # persistent disk cache (VERDICT r3 #3): epoch 1 BUILDS the cache
        # (decode + memmap append), epoch 2 simulates the next process's
        # FIRST epoch (fresh cache instance reading the memmap)
        from mmvqa_tpu.data.images import DecodedImageCache

        ds.image_cache = DecodedImageCache(
            args.image_cache_dir, cfg.image_size
        )
        loader = BatchLoader(
            ds, args.batch_size, shuffle=True, num_workers=args.workers[-1],
            drop_last=True,
        )
        (build,) = time_epochs(loader, n_epochs=1, full=True)
        ds.image_cache.flush()
        ds.image_cache = DecodedImageCache(  # fresh process analog
            args.image_cache_dir, cfg.image_size
        )
        (cold_cached,) = time_epochs(loader, n_epochs=1, full=True)
        print(json.dumps({
            "image_cache_dir": args.image_cache_dir,
            "build_epoch_img_per_sec": round(build, 1),
            "cold_epoch_from_disk_img_per_sec": round(cold_cached, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
