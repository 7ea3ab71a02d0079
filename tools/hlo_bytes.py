"""Exact per-op HBM traffic: join the optimized HLO with the trace.

The Chrome trace's `long_name` op signatures are truncated for ~40% of ops
(tools/trace_bytes.py undercounts), but the FULL optimized HLO is
retrievable through the tunnel via `compiled.as_text()`. This tool looks up
every traced op's untruncated instruction line in that HLO, sums its
operand+result tensor sizes (skipping S(1)/S(2) alternate-memory-resident
tensors, which cost no HBM), and reports per-bucket GB/step, ms/step and
effective GB/s.

Caveat: fusions containing gathers/dynamic-slices list their full source
operands, so gather-heavy ops (embedding lookup, device-side augmentation)
over-count reads; the big CNN/BN/matmul buckets read their operands fully
and are exact.

Usage:
  python tools/perf.py --variants token_head=auto --profile /tmp/trace
  python - <<'PY'   # dump the HLO (compile is cached)
  import sys; sys.path.insert(0, "tools"); from perf import build_run
  import jax
  run, state, _ = build_run({"token_head": "auto"}, 128, 30)
  open("/tmp/opt_hlo.txt", "w").write(
      run.lower(state, jax.random.PRNGKey(1)).compile().as_text())
  PY
  python tools/hlo_bytes.py /tmp/opt_hlo.txt /tmp/trace --steps 30
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_buckets import load_ops  # noqa: E402
from trace_bytes import tensor_bytes  # noqa: E402

_INSTR_RE = re.compile(r"^\s+(?:ROOT\s+)?%([\w.\-]+) = ")


def load_hlo_lines(path: str) -> dict:
    lines = {}
    with open(path) as f:
        for line in f:
            m = _INSTR_RE.match(line)
            if m:
                lines[m.group(1)] = line.rstrip()
    return lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo_path")
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--ops", type=int, default=0,
                    help="also print the N highest-traffic individual ops")
    args = ap.parse_args()

    hlo = load_hlo_lines(args.hlo_path)
    evs = load_ops(args.trace_dir)
    bucket_b = collections.Counter()
    bucket_ms = collections.Counter()
    op_b = collections.Counter()
    op_ms = collections.Counter()
    missing = 0
    for e in evs:
        line = hlo.get(e["name"])
        if line is None:
            missing += 1
            continue
        b = tensor_bytes(line)
        key = e["name"].split(".")[0]
        bucket_b[key] += b
        bucket_ms[key] += e["dur"] / 1000
        op_b[e["name"]] += b
        op_ms[e["name"]] += e["dur"] / 1000

    steps = args.steps
    print(f"# {missing} traced ops not found in HLO")
    for k, b in sorted(bucket_b.items(), key=lambda kv: -kv[1])[: args.top]:
        ms = bucket_ms[k] / steps
        gb = b / steps / 1e9
        print(json.dumps({
            "bucket": k, "gb_per_step": round(gb, 2),
            "ms_per_step": round(ms, 2),
            "eff_gbps": round(gb / (ms / 1e3), 1) if ms > 0 else None,
        }))
    total_b = sum(bucket_b.values()) / steps
    total_ms = sum(bucket_ms.values()) / steps
    print(json.dumps({
        "total_gb_per_step": round(total_b / 1e9, 2),
        "total_ms_per_step": round(total_ms, 2),
        "avg_gbps": round(total_b / 1e9 / (total_ms / 1e3), 1),
    }))
    if args.ops:
        for k, b in sorted(op_b.items(), key=lambda kv: -kv[1])[: args.ops]:
            print(json.dumps({
                "op": k, "gb_per_step": round(b / steps / 1e9, 3),
                "ms_per_step": round(op_ms[k] / steps, 3),
            }))


if __name__ == "__main__":
    main()
