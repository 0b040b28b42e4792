from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastio.cpp")
_LIB = os.path.join(_DIR, "libfastio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> str | None:
    # atomic build: compile to a temp name, rename into place
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return _LIB
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib():
    """ctypes handle to libfastio, building it on first use; None if the
    toolchain or source is unavailable (callers fall back to NumPy)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # rebuild when the source is newer than the binary (a stale or
        # foreign-arch .so would otherwise be silently preferred)
        fresh = (os.path.exists(_LIB) and os.path.exists(_SRC)
                 and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC))
        path = _LIB if fresh else _compile()
        if path is None and os.path.exists(_LIB):
            path = _LIB  # no toolchain: fall back to the existing binary
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.fastio_parse_triplets.restype = ctypes.c_int64
        lib.fastio_parse_triplets.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            i64p, i64p, f64p, f64p]
        lib.fastio_parse_pairs.restype = ctypes.c_int64
        lib.fastio_parse_pairs.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, i64p, f64p]
        lib.fastio_parse_floats.restype = ctypes.c_int64
        lib.fastio_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            f64p, f64p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None
