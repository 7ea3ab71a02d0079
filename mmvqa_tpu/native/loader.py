"""Build-on-demand ctypes loader for the native components.

Compiles ``wordpiece.cpp`` with g++ -O3 into a per-user cache directory the
first time it is needed; silently unavailable (pure-Python fallback) when no
compiler exists.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _src_path() -> str:
    return os.path.join(os.path.dirname(__file__), "wordpiece.cpp")


def _cache_dir() -> str:
    d = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "mmvqa_tpu",
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    src = _src_path()
    with open(src, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:12]
    out = os.path.join(_cache_dir(), f"libwordpiece-{digest}.so")
    if os.path.exists(out):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", out],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except Exception:
        return None


def get_wordpiece_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.wp_load.restype = ctypes.c_void_p
    lib.wp_load.argtypes = [ctypes.c_char_p]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_tokenize.restype = ctypes.c_int32
    lib.wp_tokenize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return get_wordpiece_lib() is not None
