"""Measure HBM bytes/step from a trace's compiled-HLO op signatures.

XLA's cost_analysis is unusable through the axon tunnel (conv/dot
custom-calls report zero flops and fusion bytes are nonsense), so this
parses every executed op's `long_name` — the post-fusion HLO signature,
which lists each operand/result tensor with its full shape+layout — and
sums tensor sizes: one read per listed operand, one write per result.
That is the real per-fusion HBM traffic (VMEM-resident reuse inside a
fusion is invisible to HBM, and each listed tensor crosses HBM exactly
once per op in XLA's execution model, modulo S(1) prefetch reuse).

Usage:
  python tools/perf.py --variants token_head=auto --profile /tmp/trace
  python tools/trace_bytes.py /tmp/trace --steps 30
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

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8, "u64": 8,
}
_SHAPE_RE = re.compile(
    r"\b(f32|bf16|f16|s32|u32|s8|u8|pred|s16|u16|f64|s64|u64)"
    r"\[([0-9,]*)\](\{[^}]*\})?"
)


def tensor_bytes(sig: str, hbm_only: bool = True) -> int:
    """Sum tensor sizes in an HLO signature. With hbm_only, tensors whose
    layout carries an alternate-memory tag (S(1) = VMEM-resident via memory
    space assignment, S(2) = SMEM) are skipped — reading them costs no HBM
    traffic."""
    total = 0
    for dt, dims, layout in _SHAPE_RE.findall(sig):
        if hbm_only and layout and "S(" in layout:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    evs = load_ops(args.trace_dir)
    by_bucket_bytes = collections.Counter()
    by_bucket_ms = collections.Counter()
    truncated = 0
    for e in evs:
        ln = e.get("args", {}).get("long_name", "")
        if not ln:
            continue
        if not ln.rstrip().endswith(")") and "(" in ln:
            truncated += 1
        b = tensor_bytes(ln)
        key = e["name"].split(".")[0]
        by_bucket_bytes[key] += b
        by_bucket_ms[key] += e["dur"] / 1000

    steps = args.steps
    total_b = sum(by_bucket_bytes.values()) / steps
    total_ms = sum(by_bucket_ms.values()) / steps
    print(f"# {truncated} ops had truncated signatures (undercount)")
    rows = sorted(by_bucket_bytes.items(), key=lambda kv: -kv[1])[: args.top]
    for k, b in rows:
        ms = by_bucket_ms[k] / steps
        gb = b / steps / 1e9
        bw = gb / (ms / 1e3) if ms > 0 else 0.0
        print(json.dumps({"bucket": k, "gb_per_step": round(gb, 2),
                          "ms_per_step": round(ms, 2),
                          "eff_gbps": round(bw, 1)}))
    print(json.dumps({"total_gb_per_step": round(total_b / 1e9, 2),
                      "total_ms_per_step": round(total_ms, 2),
                      "avg_gbps": round(
                          total_b / 1e9 / (total_ms / 1e3), 1)}))


if __name__ == "__main__":
    main()
