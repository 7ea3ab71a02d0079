"""Round-end preflight: the suite must be GREEN before a snapshot ships.

Round 4 ended with 2 failing tests in the committed tree because the final
commits landed without a full-suite run (VERDICT r4 weak #1). CLAUDE.md
already mandates "Always green before committing"; this gives the mandate
teeth: one command that runs the FULL suite, parses the summary, writes
``SUITE_STATUS.json`` at the repo root, and exits non-zero on any failure
or error — so both a human and the driver can gate on it.

Usage:  python tools/preflight.py          # full suite (~30-60 min CPU)
        python tools/preflight.py -- -x    # extra pytest args after --
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = argv[argv.index("--") + 1:] if "--" in argv else []
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", *extra],
        cwd=REPO, capture_output=True, text=True,
    )
    tail = "\n".join((proc.stdout or "").strip().splitlines()[-15:])
    summary = ""
    for line in reversed((proc.stdout or "").splitlines()):
        if re.search(r"\b(passed|failed|error)", line):
            summary = line.strip()
            break
    red = proc.returncode != 0 or bool(
        re.search(r"\b(\d+) (failed|error)", summary)
    )
    status = {
        "green": not red,
        "returncode": proc.returncode,
        "summary": summary,
        "seconds": round(time.time() - t0, 1),
        "when": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(os.path.join(REPO, "SUITE_STATUS.json"), "w") as f:
        json.dump(status, f, indent=1)
    print(tail)
    print(json.dumps(status))
    if red:
        print("preflight: SUITE RED — do not commit a snapshot", file=sys.stderr)
        return 1
    print("preflight: suite green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
