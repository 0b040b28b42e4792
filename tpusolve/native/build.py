from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))

_lock = threading.Lock()
_libs: dict = {}


def _compile(src: str, lib_path: str) -> str | None:
    # atomic build: compile to a temp name, rename into place
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            src, "-o", tmp]
    # prefer native codegen (vector ISA) but fall back for odd toolchains
    for extra in (["-march=native", "-funroll-loops"], []):
        cmd = base[:1] + extra + base[1:]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=240)
            os.replace(tmp, lib_path)
            return lib_path
        except (OSError, subprocess.SubprocessError):
            continue
    try:
        os.unlink(tmp)
    except OSError:
        pass
    return None


def load_native(name: str, configure) -> "ctypes.CDLL | None":
    """ctypes handle to lib<name>.so built from <name>.cpp on first use;
    None if the toolchain or source is unavailable (callers fall back to
    NumPy).  ``configure(lib)`` sets restype/argtypes."""
    src = os.path.join(_DIR, f"{name}.cpp")
    lib_path = os.path.join(_DIR, f"lib{name}.so")
    with _lock:
        if name in _libs:
            return _libs[name]
        _libs[name] = None
        # rebuild when the source is newer than the binary (a stale or
        # foreign-arch .so would otherwise be silently preferred)
        fresh = (os.path.exists(lib_path) and os.path.exists(src)
                 and os.path.getmtime(lib_path) >= os.path.getmtime(src))
        path = lib_path if fresh else _compile(src, lib_path)
        if path is None and os.path.exists(lib_path):
            path = lib_path  # no toolchain: fall back to the existing binary
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            configure(lib)
        except (OSError, AttributeError):
            return None
        _libs[name] = lib
        return lib


def _configure_fastio(lib):
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


def get_lib():
    """The fastio parser library (legacy accessor)."""
    return load_native("fastio", _configure_fastio)


_npool_mod = [None, False]


def get_npool():
    """The pooling numpy-allocator extension module (npool.c), compiled on
    first use against the current Python/numpy headers; None when the
    toolchain is unavailable."""
    if _npool_mod[1]:
        return _npool_mod[0]
    _npool_mod[1] = True
    src = os.path.join(_DIR, "npool.c")
    lib_path = os.path.join(_DIR, "npool.so")
    try:
        import sysconfig
        import numpy as np
        fresh = (os.path.exists(lib_path) and os.path.exists(src)
                 and os.path.getmtime(lib_path) >= os.path.getmtime(src))
        if not fresh:
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
            os.close(fd)
            cmd = ["gcc", "-O2", "-shared", "-fPIC",
                   "-I" + sysconfig.get_paths()["include"],
                   "-I" + np.get_include(), src, "-o", tmp]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, lib_path)
        import importlib.util
        # module name must match PyInit_npool
        spec = importlib.util.spec_from_file_location("npool", lib_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _npool_mod[0] = mod
    except Exception:
        _npool_mod[0] = None
    return _npool_mod[0]


def available() -> bool:
    return get_lib() is not None
