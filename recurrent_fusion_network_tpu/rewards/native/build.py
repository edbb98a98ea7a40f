"""Build + load the native CIDEr-D shared library.

Compiles cider_d.cpp with g++ on first use (cached next to the source; a
`make -C recurrent_fusion_network_tpu/rewards/native` target does the same).
Returns None when no C++ toolchain is available so callers can fall back to
the NumPy scorer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cider_d.cpp")
_LIB = os.path.join(_DIR, "libciderd.so")

_cached: Optional[ctypes.CDLL] = None
_failed = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed:
        return None
    needs_build = not os.path.exists(_LIB) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    )
    if needs_build and not _compile():
        _failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _failed = True
        return None

    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f64p = ctypes.POINTER(ctypes.c_double)
    lib.cider_init.restype = ctypes.c_void_p
    lib.cider_init.argtypes = [
        c_i64p, c_f64p, ctypes.c_int64, ctypes.c_double, ctypes.c_int,
        ctypes.c_double,
    ]
    lib.cider_free.argtypes = [ctypes.c_void_p]
    lib.cider_score.argtypes = [
        ctypes.c_void_p,
        c_i32p, c_i64p, ctypes.c_int64,
        c_i32p, c_i64p, ctypes.c_int64,
        c_i64p, ctypes.c_int64, c_i64p,
        c_f64p, ctypes.c_int,
    ]
    _cached = lib
    return lib
