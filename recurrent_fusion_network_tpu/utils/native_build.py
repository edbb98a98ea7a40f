"""Shared build+load helper for the native (C++) extension libraries.

Both native components — the CIDEr-D reward kernel (rewards/native) and the
feature-IO pread gather (data/native) — follow the same lifecycle: compile
the single .cpp with the system C++ compiler on first use, cache the .so
next to the source, and return None on any failure so the caller engages
its documented pure-Python fallback. This module is that lifecycle, once:

  * ATOMIC install: compile to a PID-unique temp file and os.replace() it
    into place. Writing the final path directly let (a) N processes of a
    fleet race the same -o path on first use (dlopen of a half-written
    file) and (b) a SIGTERM/timeout mid-link leave a truncated .so that is
    NEWER than the source — every later process would skip the rebuild,
    fail CDLL, and silently take the slow path forever.
  * $CXX honored (the Makefiles already do), default g++.
  * Failures WARN once with the compiler stderr instead of degrading
    silently — the whole point of these libraries is throughput, so the
    fallback must be diagnosable.
  * AttributeError from missing symbols is treated like a load failure
    (a stale-but-valid ELF must engage the fallback, not crash startup).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Callable, Optional


def compile_library(src: str, lib: str) -> bool:
    """Compile src -> lib atomically; returns False (with one warning) on
    any toolchain failure."""
    cxx = os.environ.get("CXX", "g++")
    tmp = f"{lib}.{os.getpid()}.tmp"
    # -ffp-contract=off: GCC contracts a*b+c into FMA by default at -O3 on
    # FMA-capable targets, which would round differently from the numpy
    # fallback — the native/numpy engines must not make training rewards
    # depend on the build toolchain (they still differ at the last ULP
    # from summation ORDER; see the CiderD backend note)
    cmd = [cxx, "-O3", "-ffp-contract=off", "-shared", "-fPIC",
           "-std=c++17", "-pthread", src, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=240)
        if proc.returncode != 0:
            warnings.warn(
                f"native build failed ({' '.join(cmd[:1])} rc="
                f"{proc.returncode}); falling back to the pure-Python "
                f"path.\n{proc.stderr.decode(errors='replace')[-2000:]}"
            )
            return False
        os.replace(tmp, lib)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        warnings.warn(
            f"native build unavailable ({type(e).__name__}: {e}); "
            f"falling back to the pure-Python path"
        )
        return False
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def load_or_build(
    src: str,
    lib: str,
    configure: Callable[[ctypes.CDLL], None],
    state: dict,
) -> Optional[ctypes.CDLL]:
    """Load lib (building from src if missing/stale), run `configure` to
    set restype/argtypes, and memoize in `state` ({'lib': ..., 'failed':
    bool} — module-level dict in the caller so each component caches
    independently). Returns None once failed; callers fall back."""
    if state.get("lib") is not None:
        return state["lib"]
    if state.get("failed"):
        return None
    # staleness keys on the NEWEST of (source, this builder module): a
    # compile-flag change lands here, so touching this file rebuilds every
    # cached .so — otherwise a flag fix (e.g. -ffp-contract=off) would
    # never reach machines with a previously built library
    newest_input = max(
        (os.path.getmtime(s) for s in (src, __file__) if os.path.exists(s)),
        default=0.0,
    )
    needs_build = not os.path.exists(lib) or (
        newest_input > os.path.getmtime(lib)
    )
    if needs_build and not compile_library(src, lib):
        state["failed"] = True
        return None
    try:
        handle = ctypes.CDLL(lib)
        configure(handle)
    except (OSError, AttributeError) as e:
        # a half-written .so from a pre-atomic build, or a stale library
        # missing the expected symbols: rebuild once from source before
        # giving up (the atomic install makes the rebuild safe to race)
        if compile_library(src, lib):
            try:
                handle = ctypes.CDLL(lib)
                configure(handle)
            except (OSError, AttributeError) as e2:
                warnings.warn(
                    f"native library unusable after rebuild "
                    f"({type(e2).__name__}: {e2}); using the pure-Python path"
                )
                state["failed"] = True
                return None
        else:
            warnings.warn(
                f"native library load failed ({type(e).__name__}: {e}); "
                f"using the pure-Python path"
            )
            state["failed"] = True
            return None
    state["lib"] = handle
    return handle
