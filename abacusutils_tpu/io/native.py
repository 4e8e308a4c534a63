"""ctypes bindings to the native (C++) IO library, with auto-build.

The native library accelerates the blosc decode path that feeds catalog
staging (threaded zstd + unshuffle, see native/abacus_io/abacus_io.cpp).
If the shared library is absent it is built on first use (g++ + libzstd);
failures fall back silently to the pure-Python codec.
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ['get_native_lib', 'decode_blosc_stream_native', 'compress_blosc_stream_native']

_NATIVE_DIR = Path(__file__).parent.parent.parent / 'native' / 'abacus_io'
_LIB = None
_TRIED = False


def _build():
    try:
        subprocess.run(
            ['make', '-s'],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_native_lib():
    """Load (building if necessary) the native IO library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get('ABACUS_NO_NATIVE'):
        return None
    so = _NATIVE_DIR / 'libabacus_io.so'
    if not so.exists() and _NATIVE_DIR.exists():
        _build()
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.abacus_decode_blosc_stream.restype = ctypes.c_int
        lib.abacus_decode_blosc_stream.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.abacus_compress_blosc_stream.restype = ctypes.c_int64
        lib.abacus_compress_blosc_stream.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def decode_blosc_stream_native(buf, out, nthreads=4):
    """Decode a framed blosc stream into uint8 ndarray `out` using the native
    library. Returns True on success, False if unavailable/failed."""
    lib = get_native_lib()
    if lib is None:
        return False
    arr = np.frombuffer(memoryview(buf), dtype=np.uint8)  # zero-copy view
    rc = lib.abacus_decode_blosc_stream(
        arr.ctypes.data_as(ctypes.c_void_p),
        arr.nbytes,
        out.ctypes.data_as(ctypes.c_void_p),
        out.nbytes,
        int(nthreads),
    )
    return rc == 0


def compress_blosc_stream_native(
    data, typesize, clevel=1, chunk_nbytes=1 << 22, nthreads=4
):
    """Compress bytes-like `data` into the framed blosc stream with the
    native library. Returns bytes, or None if unavailable/failed."""
    lib = get_native_lib()
    if lib is None or not hasattr(lib, 'abacus_compress_blosc_stream'):
        return None
    arr = np.frombuffer(memoryview(data).cast('B'), dtype=np.uint8)
    nchunks = max(1, -(-len(arr) // chunk_nbytes))
    # generous bound: per chunk header/offsets + zstd bound (~n + n/255 + 64)
    cap = nchunks * (4 + 16 + 4 * (chunk_nbytes // max(1, typesize) + 2) + 128)
    cap += len(arr) + len(arr) // 128 + 1024
    out = np.empty(cap, dtype=np.uint8)
    n = lib.abacus_compress_blosc_stream(
        arr.ctypes.data_as(ctypes.c_void_p),
        arr.nbytes,
        int(typesize),
        int(clevel),
        int(chunk_nbytes),
        out.ctypes.data_as(ctypes.c_void_p),
        out.nbytes,
        int(nthreads),
    )
    if n <= 0:
        return None
    return out[:n].tobytes()
