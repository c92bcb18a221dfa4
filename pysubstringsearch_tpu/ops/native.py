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

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REPO_ROOT = os.path.dirname(_PKG_ROOT)

# Search order: wheel layout (setup.py's build_native output inside the
# package) first, then the source-checkout layout with on-demand g++ build.
_WHEEL_SO = os.path.join(_PKG_ROOT, '_native', 'libtpuss.so')
_SRC_CANDIDATES = (
    os.path.join(_REPO_ROOT, 'native', 'sais.cpp'),
    os.path.join(_PKG_ROOT, '_native', 'sais.cpp'),
)


def _build() -> typing.Optional[str]:
    if os.path.exists(_WHEEL_SO):
        return _WHEEL_SO
    src = next((s for s in _SRC_CANDIDATES if os.path.exists(s)), None)
    if src is None:
        return None
    so = os.path.join(os.path.dirname(src), 'libtpuss.so')
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = [
        'g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-march=native',
        '-pthread', '-o', so, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (OSError, subprocess.SubprocessError):
        return so if os.path.exists(so) else None
    return so


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
        # Newer entry points; probe so stale prebuilt .so files still load.
        if hasattr(lib, 'tpuss_build_sa_i32'):
            lib.tpuss_build_sa_i32.restype = ctypes.c_int32
            lib.tpuss_build_sa_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
        if hasattr(lib, 'tpuss_unbwt'):
            lib.tpuss_unbwt.restype = ctypes.c_int32
            lib.tpuss_unbwt.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
            ]
        if hasattr(lib, 'tpuss_probe_batch'):
            lib.tpuss_probe_batch.restype = ctypes.c_int32
            lib.tpuss_probe_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
        if hasattr(lib, 'tpuss_probe_multi'):
            lib.tpuss_probe_multi.restype = ctypes.c_int32
            lib.tpuss_probe_multi.argtypes = [
                ctypes.c_int32,                        # nchunks
                ctypes.POINTER(ctypes.c_void_p),       # datas
                ctypes.POINTER(ctypes.c_int32),        # ns
                ctypes.POINTER(ctypes.c_void_p),       # sas
                ctypes.POINTER(ctypes.c_uint8),        # pats
                ctypes.POINTER(ctypes.c_int32),        # lens
                ctypes.c_int32,                        # stride
                ctypes.c_int32,                        # B
                ctypes.POINTER(ctypes.c_int32),        # lo_out
                ctypes.POINTER(ctypes.c_int32),        # cnt_out
                ctypes.c_int32,                        # nthreads
            ]
            lib.tpuss_extract_spans.restype = ctypes.c_int32
            lib.tpuss_extract_spans.argtypes = [
                ctypes.c_int32,                        # nchunks
                ctypes.POINTER(ctypes.c_void_p),       # datas
                ctypes.POINTER(ctypes.c_int32),        # ns
                ctypes.POINTER(ctypes.c_void_p),       # sas
                ctypes.POINTER(ctypes.c_int64),        # text_offs
                ctypes.POINTER(ctypes.c_int32),        # lo
                ctypes.POINTER(ctypes.c_int32),        # cnt
                ctypes.c_int32,                        # B
                ctypes.POINTER(ctypes.c_int64),        # out_base
                ctypes.POINTER(ctypes.c_int64),        # spans_out
                ctypes.POINTER(ctypes.c_int32),        # out_cnt
                ctypes.c_int32,                        # nthreads
            ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# CPython extension (native/fastext.c): batch line materialization.  Built
# on demand like the ctypes kernel; import failure degrades to the python
# fan-out in ops/extract.py.
# ---------------------------------------------------------------------------

_FASTEXT = None
_FASTEXT_TRIED = False


def _build_fastext() -> typing.Optional[str]:
    import sysconfig

    wheel_so = os.path.join(_PKG_ROOT, '_fastext.so')
    if os.path.exists(wheel_so):
        return wheel_so
    src = next(
        (
            s
            for s in (
                os.path.join(_REPO_ROOT, 'native', 'fastext.c'),
                os.path.join(_PKG_ROOT, '_native', 'fastext.c'),
            )
            if os.path.exists(s)
        ),
        None,
    )
    if src is None:
        return None
    so = os.path.join(os.path.dirname(src), '_fastext.so')
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    inc = sysconfig.get_paths()['include']
    cmd = ['gcc', '-O2', '-shared', '-fPIC', f'-I{inc}', '-o', so, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (OSError, subprocess.SubprocessError):
        return so if os.path.exists(so) else None
    return so


def fastext():
    """The native materialization module, or None when unavailable."""
    global _FASTEXT, _FASTEXT_TRIED
    with _LOCK:
        if _FASTEXT is not None or _FASTEXT_TRIED:
            return _FASTEXT
        _FASTEXT_TRIED = True
        so = _build_fastext()
        if so is None:
            return None
        import importlib.util

        try:
            spec = importlib.util.spec_from_file_location(
                'pysubstringsearch_tpu._fastext', so
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except Exception:
            return None
        _FASTEXT = mod
        return _FASTEXT


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


def suffix_array_int_native(data: np.ndarray, k: int) -> np.ndarray:
    """SA over an int32 alphabet [0, k) — `libsais_int` parity
    (reference src/libsais/libsais.c:6612-6625)."""
    lib = _load()
    if lib is None or not hasattr(lib, 'tpuss_build_sa_i32'):
        raise RuntimeError('native int-alphabet SA-IS is not available')
    data = np.ascontiguousarray(data, dtype=np.int32)
    n = data.size
    sa = np.empty(n, dtype=np.int32)
    if n == 0:
        return sa
    rc = lib.tpuss_build_sa_i32(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(n),
        ctypes.c_int32(k),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f'native int SA-IS failed with code {rc}')
    return sa


def probe_batch_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, 'tpuss_probe_batch')


def probe_batch_native(
    data: np.ndarray,
    sa: np.ndarray,
    packed: np.ndarray,  # uint8 [B, stride], zero padded
    lengths: np.ndarray,  # int32 [B]
) -> typing.Tuple[np.ndarray, np.ndarray]:
    """(lower, count) int32 [B] via the native host bisection (the host twin
    of the device probe; reference per-chunk searches: src/lib.rs:212-252).

    Releases the GIL for the whole batch, so callers can thread across
    (chunk, pattern-block) pairs.
    """
    lib = _load()
    if lib is None or not hasattr(lib, 'tpuss_probe_batch'):
        raise RuntimeError('native probe_batch is not available')
    data = np.ascontiguousarray(data, dtype=np.uint8)
    sa = np.ascontiguousarray(sa, dtype=np.int32)
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    B, stride = packed.shape
    lo = np.empty(B, dtype=np.int32)
    cnt = np.empty(B, dtype=np.int32)
    rc = lib.tpuss_probe_batch(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(data.size),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(stride),
        ctypes.c_int32(B),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f'native probe_batch failed with code {rc}')
    return lo, cnt


def unbwt_native(u: np.ndarray, primary_index: int) -> np.ndarray:
    """Inverse BWT via the native LF walk (libsais_unbwt parity)."""
    lib = _load()
    if lib is None or not hasattr(lib, 'tpuss_unbwt'):
        raise RuntimeError('native unbwt is not available')
    u = np.ascontiguousarray(u, dtype=np.uint8)
    out = np.empty(u.size, dtype=np.uint8)
    rc = lib.tpuss_unbwt(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(u.size),
        ctypes.c_int32(primary_index),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f'native unbwt failed with code {rc}')
    return out
