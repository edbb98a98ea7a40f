"""Build + load the native feature-IO shared library.

Compiles feature_io.cpp with g++ on first use (cached next to the source; a
`make -C recurrent_fusion_network_tpu/data/native` target does the same).
Returns None when no C++ toolchain is available so callers can fall back to
numpy memmap reads. Same pattern as rewards/native/build.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "feature_io.cpp")
_LIB = os.path.join(_DIR, "libfeatureio.so")

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
    lib.gather_rows.restype = ctypes.c_int
    lib.gather_rows.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    _cached = lib
    return lib
