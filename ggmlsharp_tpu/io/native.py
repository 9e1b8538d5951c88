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


# --- native SPM tokenizer encode (native/tokenize.cpp) ---------------------

_TOK_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtokenize.so"))
_tok_lib = None
_tok_tried = False


def _load_tok():
    global _tok_lib, _tok_tried
    if _tok_tried:
        return _tok_lib
    _tok_tried = True
    if not os.path.exists(_TOK_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "libtokenize.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_TOK_LIB_PATH)
        assert lib.tokenize_abi_version() == 1
        lib.spm_create.restype = ctypes.c_void_p
        lib.spm_create.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.spm_encode.restype = ctypes.c_int32
        lib.spm_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.spm_destroy.argtypes = [ctypes.c_void_p]
        _tok_lib = lib
    except Exception:
        _tok_lib = None
    return _tok_lib


class NativeSPM:
    """Handle to a C++ SPM vocab (native/tokenize.cpp). Built once per
    tokenizer; encode() runs the O(n log n) priority-queue merge loop
    natively — identical ids to the Python greedy rescan."""

    def __init__(self, tokens, scores, byte_ids, unk_id: int):
        lib = _load_tok()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable")
        blobs = [t.encode("utf-8") for t in tokens]
        offs = np.zeros(len(blobs) + 1, np.uint64)
        np.cumsum([len(b) for b in blobs], out=offs[1:])
        blob = np.frombuffer(b"".join(blobs), np.uint8) if blobs else \
            np.zeros(1, np.uint8)
        sc = np.asarray(scores, np.float32)
        bi = np.full(256, -1, np.int32)
        for b, i in byte_ids.items():
            bi[b] = i
        self._lib = lib
        self._h = lib.spm_create(
            _u8(np.ascontiguousarray(blob)), _ptr(offs, ctypes.c_uint64),
            _ptr(sc, ctypes.c_float), len(blobs),
            _ptr(bi, ctypes.c_int32), unk_id)

    def encode(self, working_text: str):
        """working_text: the pre-transformed string (space prefix + U+2581
        substitution already applied)."""
        data = np.frombuffer(working_text.encode("utf-8"), np.uint8)
        if data.size == 0:
            return []
        out = np.empty(max(16, data.size * 2), np.int32)
        n = self._lib.spm_encode(
            self._h, _u8(np.ascontiguousarray(data)), data.size,
            _ptr(out, ctypes.c_int32), out.size)
        if n < 0:
            out = np.empty(-n, np.int32)
            n = self._lib.spm_encode(
                self._h, _u8(np.ascontiguousarray(data)), data.size,
                _ptr(out, ctypes.c_int32), out.size)
        return out[:n].tolist()

    def __del__(self):
        try:
            self._lib.spm_destroy(self._h)
        except Exception:
            pass


def tokenizer_available() -> bool:
    return _load_tok() is not None


class NativeBPE:
    """C++ byte-level BPE merge loop (native/tokenize.cpp). The GPT-2 regex
    split + bytes_to_unicode mapping stay in Python; each piece's merge
    runs natively. Id-identical to the Python rescan."""

    def __init__(self, tokens, merges, unk_id: int = 0):
        lib = _load_tok()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable")
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int32, ctypes.c_int32,
        ]
        lib.bpe_encode_piece.restype = ctypes.c_int32
        lib.bpe_encode_piece.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.bpe_encode_pieces.restype = ctypes.c_int32
        lib.bpe_encode_pieces.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        tb = [t.encode("utf-8") for t in tokens]
        toffs = np.zeros(len(tb) + 1, np.uint64)
        np.cumsum([len(b) for b in tb], out=toffs[1:])
        tblob = np.frombuffer(b"".join(tb), np.uint8) if tb else \
            np.zeros(1, np.uint8)
        parts = []
        for m in merges:
            l, r = m.split(" ", 1)
            parts += [l.encode("utf-8"), r.encode("utf-8")]
        moffs = np.zeros(len(parts) + 1, np.uint64)
        np.cumsum([len(b) for b in parts], out=moffs[1:])
        mblob = np.frombuffer(b"".join(parts), np.uint8) if parts else \
            np.zeros(1, np.uint8)
        self._lib = lib
        self._h = lib.bpe_create(
            _u8(np.ascontiguousarray(tblob)), _ptr(toffs, ctypes.c_uint64),
            len(tb), _u8(np.ascontiguousarray(mblob)),
            _ptr(moffs, ctypes.c_uint64), len(merges), unk_id)

    def encode_pieces(self, pieces):
        """pieces: list of pre-mapped strings → flat id list; ONE native
        call for the whole request."""
        blobs = [p.encode("utf-8") for p in pieces]
        offs = np.zeros(len(blobs) + 1, np.int64)
        np.cumsum([len(b) for b in blobs], out=offs[1:])
        data = np.frombuffer(b"".join(blobs), np.uint8) if blobs else \
            np.zeros(1, np.uint8)
        if offs[-1] == 0:
            return []
        out = np.empty(max(16, int(offs[-1])), np.int32)
        n = self._lib.bpe_encode_pieces(
            self._h, _u8(np.ascontiguousarray(data)),
            _ptr(offs, ctypes.c_int64), len(blobs),
            _ptr(out, ctypes.c_int32), out.size)
        if n < 0:
            out = np.empty(-n, np.int32)
            n = self._lib.bpe_encode_pieces(
                self._h, _u8(np.ascontiguousarray(data)),
                _ptr(offs, ctypes.c_int64), len(blobs),
                _ptr(out, ctypes.c_int32), out.size)
        return out[:n].tolist()

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._h)
        except Exception:
            pass
