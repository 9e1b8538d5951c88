"""ctypes bindings for the native repack library (native/repack.cpp).

The C++ path repacks GGUF wire blocks → TPU planar planes with a row-parallel
thread pool — loading a 7B model touches multiple GB, and the numpy fallback
in gguf.py is single-threaded. Auto-builds with make on first use (g++ is
baked into the image); silently falls back to numpy when unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..dtypes import GType
from ..quant.formats import QTensor

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librepack.so"))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        assert lib.repack_abi_version() == 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def repack_from_wire(gtype: GType, raw: bytes, shape):
    """Native wire→planar; returns QTensor of numpy planes, or None if this
    format/build is unavailable (caller falls back to the numpy path)."""
    lib = _load()
    if lib is None:
        return None
    k = shape[-1]
    rows = int(np.prod(shape)) // k
    wire = np.frombuffer(raw, np.uint8)
    C32, C16 = k // 32, k // 16

    if gtype == GType.Q8_0:
        qs = np.empty((rows, k), np.int8)
        d = np.empty((rows, C32), np.float16)
        dp = np.empty((rows, C32 // 2), np.uint32) if C32 % 2 == 0 else None
        lib.repack_q8_0(
            _u8(wire), rows, k, _ptr(qs, ctypes.c_int8),
            _ptr(d.view(np.uint16), ctypes.c_uint16),
            _ptr(dp, ctypes.c_uint32) if dp is not None else None,
        )
        planes = {"qs": qs, "d": d}
        if dp is not None:
            planes["d_p"] = dp
        return QTensor(gtype, tuple(shape), planes)

    if gtype == GType.Q4_0:
        qs = np.empty((rows, k // 8), np.uint32)
        d = np.empty((rows, C32), np.float16)
        dp = np.empty((rows, C32 // 2), np.uint32) if C32 % 2 == 0 else None
        lib.repack_q4_0(
            _u8(wire), rows, k, _ptr(qs, ctypes.c_uint32),
            _ptr(d.view(np.uint16), ctypes.c_uint16),
            _ptr(dp, ctypes.c_uint32) if dp is not None else None,
        )
        planes = {"qs": qs, "d": d}
        if dp is not None:
            planes["d_p"] = dp
        return QTensor(gtype, tuple(shape), planes)

    if gtype == GType.Q4_K:
        nsb = k // 256
        qs = np.empty((rows, k // 8), np.uint32)
        d = np.empty((rows, nsb), np.float16)
        dmin = np.empty((rows, nsb), np.float16)
        sc = np.empty((rows, nsb * 8), np.uint8)
        m = np.empty((rows, nsb * 8), np.uint8)
        kd = np.empty((rows, C32), np.float16)
        km = np.empty((rows, C32), np.float16)
        even = C32 % 2 == 0
        kdp = np.empty((rows, C32 // 2), np.uint32) if even else None
        kmp = np.empty((rows, C32 // 2), np.uint32) if even else None
        lib.repack_q4_k(
            _u8(wire), rows, k, _ptr(qs, ctypes.c_uint32),
            _ptr(d.view(np.uint16), ctypes.c_uint16),
            _ptr(dmin.view(np.uint16), ctypes.c_uint16),
            _ptr(sc, ctypes.c_uint8), _ptr(m, ctypes.c_uint8),
            _ptr(kd.view(np.uint16), ctypes.c_uint16),
            _ptr(km.view(np.uint16), ctypes.c_uint16),
            _ptr(kdp, ctypes.c_uint32) if even else None,
            _ptr(kmp, ctypes.c_uint32) if even else None,
        )
        planes = {"qs": qs, "d": d, "dmin": dmin, "sc": sc, "m": m,
                  "kd": kd, "km": km}
        if even:
            planes["kd_p"] = kdp
            planes["km_p"] = kmp
        return QTensor(gtype, tuple(shape), planes)

    if gtype == GType.Q6_K:
        nsb = k // 256
        ql = np.empty((rows, k // 8), np.uint32)
        qh = np.empty((rows, k // 16), np.uint32)
        d = np.empty((rows, nsb), np.float16)
        sc = np.empty((rows, nsb * 16), np.int8)
        kd = np.empty((rows, C16), np.float16)
        even = C16 % 2 == 0
        kdp = np.empty((rows, C16 // 2), np.uint32) if even else None
        lib.repack_q6_k(
            _u8(wire), rows, k, _ptr(ql, ctypes.c_uint32),
            _ptr(qh, ctypes.c_uint32),
            _ptr(d.view(np.uint16), ctypes.c_uint16),
            _ptr(sc, ctypes.c_int8),
            _ptr(kd.view(np.uint16), ctypes.c_uint16),
            _ptr(kdp, ctypes.c_uint32) if even else None,
        )
        planes = {"ql": ql, "qh": qh, "d": d, "sc": sc, "kd": kd}
        if even:
            planes["kd_p"] = kdp
        return QTensor(gtype, tuple(shape), planes)

    return None  # format not natively accelerated
