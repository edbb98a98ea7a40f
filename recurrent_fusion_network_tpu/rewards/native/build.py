"""Build + load the native CIDEr-D shared library.

Compiles cider_d.cpp with $CXX (default g++) on first use — atomically,
cached next to the source; `make -C recurrent_fusion_network_tpu/rewards/native`
does the same. Returns None when no C++ toolchain is available (one warning
with the compiler stderr) so callers fall back to the NumPy scorer.
Lifecycle shared with data/native via utils.native_build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

from ...utils.native_build import load_or_build

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cider_d.cpp")
_LIB = os.path.join(_DIR, "libciderd.so")

_state: dict = {}


def _configure(lib: ctypes.CDLL) -> None:
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


def load_library() -> Optional[ctypes.CDLL]:
    return load_or_build(_SRC, _LIB, _configure, _state)
