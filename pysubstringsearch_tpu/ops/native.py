"""ctypes loader for the native C++ host kernels (native/sais.cpp).

The shared library is built on demand with g++ (pybind11 is not assumed in
the environment; plain ``extern "C"`` + ctypes keeps the binding surface
trivial).  Everything degrades gracefully: if no compiler is available the
callers fall back to the numpy / JAX suffix-array backends.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import typing

import numpy as np

_LOCK = threading.Lock()
_LIB: typing.Optional[ctypes.CDLL] = None
_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, 'native', 'sais.cpp')
_SO = os.path.join(_REPO_ROOT, 'native', 'libtpuss.so')


def _build() -> typing.Optional[str]:
    if not os.path.exists(_SRC):
        return None
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        'g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-march=native',
        '-o', _SO, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (OSError, subprocess.SubprocessError):
        return _SO if os.path.exists(_SO) else None
    return _SO


def _load() -> typing.Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.tpuss_build_sa_u8.restype = ctypes.c_int32
        lib.tpuss_build_sa_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tpuss_find_newlines.restype = ctypes.c_int32
        lib.tpuss_find_newlines.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def suffix_array_native(data: np.ndarray) -> np.ndarray:
    """SA via the C++ SA-IS kernel; raises if the library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native SA-IS library is not available')
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.size
    if n > 0x7FFFFFFF:
        raise ValueError('chunk exceeds int32 suffix-array limit')
    sa = np.empty(n, dtype=np.int32)
    if n == 0:
        return sa
    rc = lib.tpuss_build_sa_u8(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(n),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f'native SA-IS failed with code {rc}')
    return sa
