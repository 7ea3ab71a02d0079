"""Minimal XSpace (.xplane.pb) reader: per-op device time without TF.

``jax.profiler`` writes XSpace protos; the usual readers (tensorboard
profile plugin) aren't importable in this environment, so this decodes the
protobuf wire format directly for the fields needed to rank ops by device
time. Schema subset (xplane.proto):

  XSpace.planes = 1 (repeated XPlane)
  XPlane.name = 2, XPlane.lines = 3, XPlane.event_metadata = 4 (map)
  XEventMetadata.id = 1, .name = 2
  XLine.events = 6 (repeated XEvent)
  XEvent.metadata_id = 1, .duration_ps = 3 (or .num_occurrences etc.)

Usage:
  from mmvqa_tpu.utils.xplane import top_ops
  top_ops("/tmp/trace")  # after jax.profiler.start_trace/stop_trace
"""

from __future__ import annotations

import glob
import os
from collections import Counter
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _varint(buf, i)
            yield field, wt, val
        elif wt == 1:  # 64-bit
            yield field, wt, buf[i : i + 8]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            yield field, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            yield field, wt, buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _parse_event(buf: bytes) -> Tuple[int, int]:
    meta_id = 0
    dur_ps = 0
    for f, wt, v in _fields(buf):
        if f == 1 and wt == 0:
            meta_id = v
        elif f == 3 and wt == 0:
            dur_ps = v
    return meta_id, dur_ps


def _parse_plane(buf: bytes):
    name = ""
    metadata: Dict[int, str] = {}
    durations: Counter = Counter()
    for f, wt, v in _fields(buf):
        if f == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif f == 4 and wt == 2:  # map entry: key=1 varint, value=2 msg
            mid, mname = 0, ""
            for mf, mwt, mv in _fields(v):
                if mf == 1 and mwt == 0:
                    mid = mv
                elif mf == 2 and mwt == 2:
                    for ef, ewt, ev in _fields(mv):
                        if ef == 1 and ewt == 0:
                            mid = ev
                        elif ef == 2 and ewt == 2:
                            mname = ev.decode("utf-8", "replace")
            metadata[mid] = mname
        elif f == 3 and wt == 2:  # XLine
            for lf, lwt, lv in _fields(v):
                if lf == 6 and lwt == 2:  # XEvent
                    mid, dur = _parse_event(lv)
                    durations[mid] += dur
    named = Counter()
    for mid, dur in durations.items():
        named[metadata.get(mid, f"<{mid}>")] += dur
    return name, named


def read_xspace(path_or_dir: str) -> List[Tuple[str, Counter]]:
    """Returns [(plane_name, Counter{op_name: duration_ps})]."""
    if os.path.isdir(path_or_dir):
        files = sorted(
            glob.glob(os.path.join(path_or_dir, "**", "*.xplane.pb"),
                      recursive=True)
        )
        if not files:
            raise FileNotFoundError(f"no .xplane.pb under {path_or_dir}")
        path = files[-1]
    else:
        path = path_or_dir
    buf = open(path, "rb").read()
    planes = []
    for f, wt, v in _fields(buf):
        if f == 1 and wt == 2:
            planes.append(_parse_plane(v))
    return planes


def top_ops(
    path_or_dir: str, k: int = 25, device_only: bool = True, quiet: bool = False
) -> List[Tuple[str, float]]:
    """Print and return the top-k ops by device time (ms)."""
    out = []
    for name, durs in read_xspace(path_or_dir):
        if device_only and not ("TPU" in name or "/device" in name):
            continue
        total = sum(durs.values())
        if not quiet:
            print(f"== {name}: {total / 1e9:.2f} ms total")
        for op, d in durs.most_common(k):
            out.append((op, d / 1e9))
            if not quiet:
                print(f"  {d / 1e9:9.3f} ms  {op[:110]}")
    return out
