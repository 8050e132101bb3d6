"""On-demand-built native (C++) components, loaded through ctypes.

``packer.cpp`` is compiled once per machine with g++ into ``_packer.so``
next to the source (rebuilt when the source is newer).  No pybind11: the
ABI is plain C, arrays cross as raw pointers from numpy.  If no compiler
is available, ``available()`` returns False and callers fall back to the
pure-Python path (solver/compiler.py) — identical results, just slower.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "fill_bucket", "bucket_keys"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "packer.cpp")
_SO = os.path.join(_DIR, "_packer.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                tmp = _SO + f".build{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            p64 = ctypes.POINTER(ctypes.c_double)
            p32 = ctypes.POINTER(ctypes.c_int32)
            pi64 = ctypes.POINTER(ctypes.c_int64)
            pu8 = ctypes.POINTER(ctypes.c_uint8)
            lib.fill_bucket.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                p32, p32, pi64, p32, p64, p64, p64, p64,
                p64, p64, p64, p64, p64, p32, p64, p64, p64,
            ]
            lib.fill_bucket.restype = None
            lib.bucket_keys.argtypes = [ctypes.c_int64, p32, pu8, pu8, p32]
            lib.bucket_keys.restype = None
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ty):
    return a.ctypes.data_as(ty)


def fill_bucket(m, m_real, K, is_gm, rows, width, offset, assets, reserves,
                weights, shifts, fees, R, W, S, G, mask, asset_out, degree,
                logk0, k0) -> None:
    lib = _load()
    p64 = ctypes.POINTER(ctypes.c_double)
    p32 = ctypes.POINTER(ctypes.c_int32)
    pi64 = ctypes.POINTER(ctypes.c_int64)
    lib.fill_bucket(
        m, m_real, K, is_gm,
        _ptr(rows, p32), _ptr(width, p32), _ptr(offset, pi64),
        _ptr(assets, p32), _ptr(reserves, p64), _ptr(weights, p64),
        _ptr(shifts, p64), _ptr(fees, p64),
        _ptr(R, p64), _ptr(W, p64), _ptr(S, p64), _ptr(G, p64),
        _ptr(mask, p64), _ptr(asset_out, p32), _ptr(degree, p64),
        _ptr(logk0, p64), _ptr(k0, p64),
    )


def bucket_keys(width, kind, floor_flag) -> np.ndarray:
    lib = _load()
    n = len(width)
    keys = np.empty(n, np.int32)
    p32 = ctypes.POINTER(ctypes.c_int32)
    pu8 = ctypes.POINTER(ctypes.c_uint8)
    lib.bucket_keys(
        n, _ptr(width, p32), _ptr(kind, pu8), _ptr(floor_flag, pu8),
        _ptr(keys, p32),
    )
    return keys
