"""Multi-host path exercised for real: two OS processes join one
jax.distributed cluster (CPU backend, localhost coordinator) and drive the
cross-host input sharding + metric aggregation helpers (SURVEY.md §5.8).

Asserts:
* BatchLoader(shard_index=process_index, shard_count=process_count) gives
  DISJOINT, covering shards (the strided split at data/loader.py);
* core.distributed.all_hosts_mean averages a host-side scalar across the
  processes (process_allgather path, which single-process runs never hit);
* maybe_initialize's env-var resolution (explicit args path).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, sys
    port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mmvqa_tpu.core.distributed import (
        all_hosts_mean, maybe_initialize, process_shard,
    )
    maybe_initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    from mmvqa_tpu.data.loader import BatchLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.asarray([i], np.int32)}

    pi, pc = process_shard()
    loader = BatchLoader(
        DS(), batch_size=2, num_workers=1, shard_index=pi, shard_count=pc
    )
    ids = []
    for b in loader:
        ids.extend(int(v) for v, w in zip(b["x"].ravel(), b["weights"]) if w)
    mean = all_hosts_mean(float(pi * 10))
    json.dump({"pid": pid, "ids": ids, "mean": mean}, open(out, "w"))
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_and_mean(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the distributed client must NOT inherit the 8-device virtual mesh the
    # test conftest configures for this process
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, str(worker), str(port), str(pid),
                     str(out)],
                    env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                ),
                out,
            )
        )
    results = []
    for p, out in procs:
        stdout, stderr = p.communicate(timeout=240)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\n{stderr.decode()[-2000:]}"
        )
        results.append(json.load(open(out)))

    by_pid = {r["pid"]: r for r in results}
    ids0, ids1 = set(by_pid[0]["ids"]), set(by_pid[1]["ids"])
    assert ids0 == {0, 2, 4, 6, 8}
    assert ids1 == {1, 3, 5, 7, 9}
    assert ids0.isdisjoint(ids1)
    # all_hosts_mean of per-process scalars 0.0 and 10.0 -> 5.0 on BOTH hosts
    assert by_pid[0]["mean"] == pytest.approx(5.0)
    assert by_pid[1]["mean"] == pytest.approx(5.0)
