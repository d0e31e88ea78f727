"""ctypes bindings for the native PIZ codec (csrc/exr_piz.cpp).

Compiled on first use into csrc/build/libexrpiz.so. Returns None when no
toolchain is available — utils/exr.py then raises a clear error for PIZ
reads and falls back to ZIP for writes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _compile() -> str | None:
    src = os.path.abspath(os.path.join(_CSRC, "exr_piz.cpp"))
    if not os.path.exists(src):
        return None
    build_dir = os.path.join(os.path.dirname(src), "build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, "libexrpiz.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _compile()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            # stale/foreign prebuilt binary (checkout gives .so and .cpp
            # equal mtimes): force a rebuild once, then give up gracefully
            try:
                os.remove(so)
            except OSError:
                return None
            so = _compile()
            if so is None:
                return None
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.piz_compress.restype = ctypes.c_long
        lib.piz_compress.argtypes = [u16p, ctypes.c_long, u8p,
                                     ctypes.c_long, ctypes.c_int, i32p,
                                     i32p, i32p]
        lib.piz_uncompress.restype = ctypes.c_int
        lib.piz_uncompress.argtypes = [u8p, ctypes.c_long, u16p,
                                       ctypes.c_long, ctypes.c_int, i32p,
                                       i32p, i32p]
        _LIB = lib
        return _LIB


def _chan_arrays(nx, ny, size):
    a = np.asarray(nx, np.int32)
    b = np.asarray(ny, np.int32)
    c = np.asarray(size, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    return (a, b, c, a.ctypes.data_as(i32p), b.ctypes.data_as(i32p),
            c.ctypes.data_as(i32p))


def piz_compress(planes: np.ndarray, nx, ny, size) -> bytes | None:
    """planes: flat uint16 channel-major block data. Returns PIZ bytes."""
    lib = get_lib()
    if lib is None:
        return None
    planes = np.ascontiguousarray(planes, np.uint16)
    n = planes.size
    cap = 6 + (1 << 13) + 24 + n * 3 + 8192
    out = np.empty(cap, np.uint8)
    a, b, c, ap, bp, cp = _chan_arrays(nx, ny, size)
    got = lib.piz_compress(
        planes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_long(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(cap), ctypes.c_int(len(a)), ap, bp, cp)
    if got < 0:
        return None
    return out[:got].tobytes()


def piz_uncompress(blob: bytes, n_u16: int, nx, ny, size
                   ) -> np.ndarray | None:
    """Returns flat uint16 channel-major block data, or None."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(blob, np.uint8)
    out = np.empty(n_u16, np.uint16)
    a, b, c, ap, bp, cp = _chan_arrays(nx, ny, size)
    rc = lib.piz_uncompress(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(len(blob)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_long(n_u16), ctypes.c_int(len(a)), ap, bp, cp)
    if rc != 0:
        raise ValueError(f"PIZ decode failed (code {rc})")
    return out
