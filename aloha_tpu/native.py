"""ctypes loader for the native C++ runtime support library.

Builds native/aloha_native.cpp on demand with the system C++ compiler
(cached next to the source); every entry point has a pure-NumPy fallback so
the framework works without a toolchain.  See native/aloha_native.cpp for
what the library provides and how it maps to the reference's DPI trace
reader.
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent.parent / "native"
_CPP = _SRC / "aloha_native.cpp"
_SO = _SRC / "build" / "libaloha_native.so"


@functools.lru_cache(maxsize=1)
def load():
    """Build (if stale) and load the native library; None when unavailable."""
    try:
        if not _CPP.exists():
            return None
        if not _SO.exists() or _SO.stat().st_mtime < _CPP.stat().st_mtime:
            _SO.parent.mkdir(exist_ok=True)
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    str(_CPP), "-o", str(_SO),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.aloha_parse_u64_file.restype = ctypes.c_longlong
        lib.aloha_parse_u64_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_longlong,
        ]
        lib.aloha_write_u64_file.restype = ctypes.c_longlong
        lib.aloha_write_u64_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_longlong,
        ]
        lib.aloha_tdb_open.restype = ctypes.c_void_p
        lib.aloha_tdb_open.argtypes = [ctypes.c_char_p]
        lib.aloha_tdb_rows.restype = ctypes.c_longlong
        lib.aloha_tdb_rows.argtypes = [ctypes.c_void_p]
        lib.aloha_tdb_row_words.restype = ctypes.c_longlong
        lib.aloha_tdb_row_words.argtypes = [ctypes.c_void_p]
        lib.aloha_tdb_n_fields.restype = ctypes.c_int
        lib.aloha_tdb_n_fields.argtypes = [ctypes.c_void_p]
        lib.aloha_tdb_field.restype = ctypes.c_longlong
        lib.aloha_tdb_field.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.aloha_tdb_read.restype = ctypes.c_longlong
        lib.aloha_tdb_read.argtypes = [
            ctypes.c_void_p,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.aloha_tdb_close.restype = None
        lib.aloha_tdb_close.argtypes = [ctypes.c_void_p]
        return lib
    except Exception:
        return None


def available() -> bool:
    return load() is not None


def parse_u64_file(path, max_count: int | None = None) -> np.ndarray:
    """Read a reference-style decimal dump; native fast path when built."""
    path = str(path)
    lib = load()
    if lib is None:
        return np.loadtxt(path, dtype=np.uint64).ravel()
    if max_count is None:
        # upper bound: ~2 bytes per value minimum (digit + newline)
        max_count = pathlib.Path(path).stat().st_size // 2 + 16
    out = np.empty(max_count, dtype=np.uint64)
    n = lib.aloha_parse_u64_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        max_count,
    )
    if n < 0:
        raise FileNotFoundError(path)
    return out[:n].copy()


def write_u64_file(path, vals) -> None:
    vals = np.ascontiguousarray(np.asarray(vals, dtype=np.uint64).ravel())
    lib = load()
    if lib is None:
        np.savetxt(str(path), vals, fmt="%d")
        return
    n = lib.aloha_write_u64_file(
        str(path).encode(),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        vals.size,
    )
    if n != vals.size:
        raise IOError(f"short write to {path}")
