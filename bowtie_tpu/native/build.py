"""Compile and load the native I/O library (ctypes, no pybind11)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "fastio.cpp")
_LIB = os.path.join(_HERE, "libbtfastio.so")

_cached = None
_failed = False


def build_native(force: bool = False) -> str | None:
    """Compile fastio.cpp -> libbtfastio.so.  Returns lib path or None."""
    if os.path.exists(_LIB) and not force and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"bowtie_tpu: native build failed ({e}); "
              "using pure-Python I/O", file=sys.stderr)
        return None


def load_native():
    """Load (building if needed) the native library, or None."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed:
        return None
    path = build_native()
    if path is None:
        _failed = True
        return None
    lib = ctypes.CDLL(path)
    i64 = ctypes.c_int64
    lib.parse_fastq.restype = i64
    lib.parse_fastq.argtypes = [
        ctypes.c_char_p, i64, i64, i64,
        ctypes.POINTER(i64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(i64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(i64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(i64)]
    lib.format_sam_hit.restype = i64
    _cached = lib
    return lib


if __name__ == "__main__":
    p = build_native(force=True)
    print("built:", p)
