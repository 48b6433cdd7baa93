"""Native (C++) host runtime components, bound via ctypes.

The compute path of the framework is JAX/XLA/Pallas; the host data plane
around it is native where it pays: the HITRAN ``.par`` parser here is a
multithreaded C++ single-pass parser (see ``parparse.cpp``). The shared
library is built on first use with the system toolchain and cached next to
the source; if no compiler is available everything falls back to the
vectorized numpy implementations transparently.

Set ``CLEARSKY_TPU_NO_NATIVE=1`` to disable the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["parse_par_native", "native_available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "parparse.cpp")
_LIB = os.path.join(_DIR, "libparparse.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # link to a per-process temp name and publish with an atomic rename:
    # concurrent importers (e.g. pytest workers) must never dlopen a
    # half-written .so — a truncated ELF poisons that process's _tried cache
    # into the slow numpy fallback for its whole lifetime
    tmp = f"{_LIB}.tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
        _SRC, "-o", tmp,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0 or not os.path.exists(tmp):
            return False
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CLEARSKY_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        D = ctypes.POINTER(ctypes.c_double)
        lib.clearsky_parse_par.restype = ctypes.c_int64
        lib.clearsky_parse_par.argtypes = [
            ctypes.c_char_p,
            *(ctypes.POINTER(D) for _ in range(8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ]
        lib.clearsky_free.restype = None
        lib.clearsky_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def parse_par_native(path: str) -> dict | None:
    """Parse the numeric .par columns with the C++ parser.

    Returns a dict with keys M, I, nu, S, A, ga, gs, Epp, na, da (the columns
    the physics consumes), or None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    D = ctypes.POINTER(ctypes.c_double)
    fptrs = [D() for _ in range(8)]
    Mp = ctypes.POINTER(ctypes.c_int16)()
    Ip = ctypes.POINTER(ctypes.c_char)()
    n = lib.clearsky_parse_par(
        path.encode(), *(ctypes.byref(p) for p in fptrs),
        ctypes.byref(Mp), ctypes.byref(Ip),
    )
    if n < 0:
        raise OSError(f"native parser failed to read {path}")
    keys = ("nu", "S", "A", "ga", "gs", "Epp", "na", "da")
    out = {}
    try:
        for k, p in zip(keys, fptrs):
            out[k] = np.ctypeslib.as_array(p, shape=(n,)).copy()
            if np.isnan(out[k]).any():
                # partially-parseable field (NaN sentinel from parse_field):
                # defer to the strict numpy parser, which raises with context
                return None
        out["M"] = np.ctypeslib.as_array(Mp, shape=(n,)).copy()
        raw = ctypes.cast(Ip, ctypes.POINTER(ctypes.c_char * n)) if n else None
        out["I"] = (
            np.frombuffer(bytes(raw.contents), dtype="S1").astype("U1")
            if n
            else np.empty(0, dtype="U1")
        )
    finally:
        for p in fptrs:
            lib.clearsky_free(p)
        lib.clearsky_free(Mp)
        lib.clearsky_free(Ip)
    return out
