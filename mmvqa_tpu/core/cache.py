"""Persistent XLA compilation cache.

The flagship scanned train step is a single large XLA program whose compile
dominates cold-start wall time (minutes through the remote-device tunnel,
where even the reference's per-epoch Python loops are cheap by comparison —
the reference has no compile step at all, roco_utils.py:207-290). JAX's
persistent cache keys executables by (program, compile options, topology),
so every driver, bench, and tool process on the same chip reuses the first
process's compile. Mosaic/Pallas kernels are embedded in the cached
executable and need no separate handling.

Off by default only for tests (tests/conftest.py uses many tiny programs
below the compile-time threshold anyway).
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
# Repo-local (gitignored) so the cache survives as long as the checkout
# does — /tmp may be wiped between sessions.
DEFAULT_CACHE_DIR = os.environ.get(
    "MMVQA_COMPILE_CACHE",
    os.path.join(_REPO_ROOT, ".cache", "jax_compilation"),
)


def enable_compilation_cache(
    cache_dir: str = "", min_compile_seconds: float = 5.0
) -> None:
    """Idempotently turn on JAX's persistent compilation cache.

    Safe to call before or after backend init; programs compiling faster
    than ``min_compile_seconds`` are not persisted (keeps the cache to the
    handful of big train-step executables).
    """
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", cache_dir or DEFAULT_CACHE_DIR
    )
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_seconds
    )
    # cache regardless of backend (the axon tunnel backend is non-standard;
    # 'all' opts it in — correctness is keyed on topology fingerprint)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
