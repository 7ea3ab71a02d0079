"""Generate synthetic ROCO + VQA-Med fixture datasets for smoke runs.

(No reference equivalent — SURVEY.md §4 test-strategy prescription.)

Usage: python -m mmvqa_tpu.cli.make_fixtures --out /tmp/fixture
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="make synthetic fixture datasets")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--n_train", type=int, default=32)
    p.add_argument("--n_val", type=int, default=16)
    p.add_argument("--n_per_cat", type=int, default=8)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from mmvqa_tpu.data.fixtures import make_roco_fixture, make_vqa_fixture

    roco = make_roco_fixture(
        os.path.join(args.out, "roco"), args.n_train, args.n_val,
        args.seed, args.image_size,
    )
    vqa = make_vqa_fixture(
        os.path.join(args.out, "vqa"), args.n_per_cat, args.seed,
        args.image_size,
    )
    print(f"ROCO fixture: {roco}")
    print(f"VQA-Med fixture: {vqa}")


if __name__ == "__main__":
    main()
