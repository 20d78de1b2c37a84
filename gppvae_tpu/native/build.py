"""Lazy g++ build + ctypes load of the native library.

The .so is cached next to the sources keyed by a source hash, so rebuilds
happen only when the C++ changes. Thread-unsafe first build is fine (the
builder runs on the host data path, single process).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ("rotate.cpp",)
_LIB = None
_TRIED = False


def _source_hash() -> str:
    h = hashlib.sha1()
    for s in _SOURCES:
        with open(os.path.join(_DIR, s), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def _build() -> str | None:
    tag = _source_hash()
    so_path = os.path.join(_DIR, f"_gppvae_native_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", so_path, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so_path


def get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GPPVAE_NO_NATIVE") == "1":
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.rotate_bilinear_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rotate_bilinear_f32.restype = None
        _LIB = lib
    except OSError:
        return None
    return _LIB


def native_available() -> bool:
    return get_lib() is not None
