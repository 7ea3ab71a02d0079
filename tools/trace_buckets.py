"""Aggregate a jax.profiler Chrome trace into per-op-kind time buckets.

Usage:
  python tools/perf.py --variants token_head=auto --profile /tmp/trace
  python tools/trace_buckets.py /tmp/trace [--steps 10] [--top 25] [--ops 20]
  python tools/trace_buckets.py /tmp/trace --inspect convert_reduce_fusion.763

Reads the 'XLA Ops' lane (pid=3/tid=3) of the vm.trace.json.gz the TPU
runtime emits (the xplane.pb planes come back empty through the axon
tunnel — CLAUDE.md). The scan 'while' op nests its inner ops' time, so it
is excluded to avoid double counting. --inspect prints an op's HLO
long_name / source / tf_op, which identifies the producing model layer.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_ops(trace_dir: str):
    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    return [
        e for e in data.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3
        and not e["name"].startswith("while")
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=10,
                    help="steps traced (divides totals into ms/step)")
    ap.add_argument("--top", type=int, default=25, help="bucket rows")
    ap.add_argument("--ops", type=int, default=20, help="individual-op rows")
    ap.add_argument("--inspect", default="",
                    help="print args of ONE op by exact name")
    args = ap.parse_args()

    evs = load_ops(args.trace_dir)

    if args.inspect:
        for e in evs:
            if e["name"] == args.inspect:
                print(e["name"], e["dur"] / 1000, "ms (one instance)")
                for k in ("tf_op", "source", "long_name"):
                    v = e.get("args", {}).get(k, "")
                    if v:
                        print(f"  {k}: {v[:400]}")
                return
        raise SystemExit(f"op {args.inspect!r} not found")

    btot, bcnt = collections.Counter(), collections.Counter()
    tot, cnt = collections.Counter(), collections.Counter()
    for e in evs:
        key = e["name"].split(".")[0].split("(")[0]
        btot[key] += e["dur"]
        bcnt[key] += 1
        tot[e["name"]] += e["dur"]
        cnt[e["name"]] += 1

    div = 1000 * args.steps
    print(f"== buckets (ms/step over {args.steps} steps) ==")
    for k, v in btot.most_common(args.top):
        print(f"{k:42s} {v/div:8.2f}  n/step={bcnt[k]//args.steps}")
    print("TOTAL", round(sum(btot.values()) / div, 2), "ms/step")
    print(f"== top individual ops ==")
    for k, v in tot.most_common(args.ops):
        print(f"{k[:64]:64s} {v/div:8.2f}")


if __name__ == "__main__":
    main()
