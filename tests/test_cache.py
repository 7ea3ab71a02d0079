"""Persistent compilation cache (core/cache.py): the cache dir is
configured, written on a slow-enough compile, and HIT by a fresh process.

Uses subprocesses because the cache is only exercised across process
boundaries (in-process, jax's own executable cache absorbs everything).
The probe program nests a scan over a conv to clear the 5 s persistence
threshold on CPU.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = textwrap.dedent(
    """
    import logging, os, sys, time
    sys.path.insert(0, %r)
    os.environ["MMVQA_COMPILE_CACHE"] = sys.argv[1]
    logging.basicConfig(level=logging.WARNING)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_explain_cache_misses", True)
    from mmvqa_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache(min_compile_seconds=0.0)
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(6):
                x = nn.Conv(48, (3, 3), name=f"c{i}")(x)
                x = nn.silu(x)
            return x.sum()

    x = jnp.ones((8, 64, 64, 24))
    net = Net()
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)

    def step(v, x):
        def body(c, _):
            return c + net.apply(v, x), ()
        return jax.lax.scan(body, jnp.float32(0), None, length=4)[0]

    t0 = time.time()
    float(jax.jit(step).lower(v, x).compile()(v, x))
    print("COMPILE_SECONDS", time.time() - t0)
    """
) % (REPO,)


def _run(cache_dir):
    r = subprocess.run(
        [sys.executable, "-c", PROBE, cache_dir],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stderr


def test_cache_dir_written_and_hit_across_processes(tmp_path):
    cache = str(tmp_path / "jc")
    log_cold = _run(cache)
    entries = [e for e in os.listdir(cache) if e.startswith("jit_step-")]
    assert entries, f"no jit_step entry persisted:\n{log_cold[-1500:]}"
    assert "cache hit for 'jit_step'" not in log_cold
    # a FRESH process must load the persisted executable, not recompile
    log_warm = _run(cache)
    assert "cache hit for 'jit_step'" in log_warm, log_warm[-1500:]
