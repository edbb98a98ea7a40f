"""Build + load the native feature-IO shared library.

Compiles feature_io.cpp with $CXX (default g++) on first use — atomically,
cached next to the source; `make -C recurrent_fusion_network_tpu/data/native`
does the same. Returns None when no C++ toolchain is available (one warning
with the compiler stderr) so callers fall back to numpy memmap reads.
Lifecycle shared with rewards/native via utils.native_build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

from ...utils.native_build import load_or_build

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "feature_io.cpp")
_LIB = os.path.join(_DIR, "libfeatureio.so")

_state: dict = {}


def _configure(lib: ctypes.CDLL) -> None:
    lib.gather_rows.restype = ctypes.c_int
    lib.gather_rows.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int,
    ]


def load_library() -> Optional[ctypes.CDLL]:
    return load_or_build(_SRC, _LIB, _configure, _state)
