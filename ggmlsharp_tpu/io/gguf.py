"""GGUF reader/writer + wire↔canonical block conversion.

GGUF is llama.cpp's model container (magic ``GGUF``, little-endian; v2/v3).
The reference predates it and has no loader at all (SURVEY §5); BASELINE's
perplexity-parity target requires importing GGUF Q4_0/Q8_0/k-quant tensors
bit-exactly.

Wire block layouts converted here (llama.cpp ggml-common.h):
  Q4_0: {f16 d; u8 qs[16]}            elem j  = qs[j]&0xF, elem j+16 = qs[j]>>4
  Q4_1: {f16 d, m; u8 qs[16]}         same split-half nibble order
  Q5_0: {f16 d; u8 qh[4]; u8 qs[16]}  bit j of qh = 5th bit of elem j
  Q5_1: {f16 d, m; u8 qh[4]; u8 qs[16]}
  Q8_0: {f16 d; i8 qs[32]}
  Q4_K: {f16 d, dmin; u8 scales[12]; u8 qs[128]}  (6-bit packed scales/mins)
  Q6_K: {u8 ql[128]; u8 qh[64]; i8 scales[16]; f16 d}
  F32 / F16 passthrough.

Canonical in-memory layout is the TPU planar QTensor (quant.formats);
conversion happens in numpy at load/save time where layout is free.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..dtypes import GType
from ..quant.formats import QTensor

MAGIC = b"GGUF"

# GGUF value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32, _T_F32, _T_BOOL, _T_STR, \
    _T_ARR, _T_U64, _T_I64, _T_F64 = range(13)

# GGML wire dtype ids (ggml.h enum, modern numbering)
GGML_WIRE = {
    0: GType.F32, 1: GType.F16, 2: GType.Q4_0, 3: GType.Q4_1,
    6: GType.Q5_0, 7: GType.Q5_1, 8: GType.Q8_0, 9: GType.Q8_1,
    12: GType.Q4_K, 14: GType.Q6_K, 15: GType.Q8_K,
}
WIRE_ID = {v: k for k, v in GGML_WIRE.items()}

WIRE_BLOCK_BYTES = {
    GType.F32: (1, 4), GType.F16: (1, 2),
    GType.Q4_0: (32, 18), GType.Q4_1: (32, 20),
    GType.Q5_0: (32, 22), GType.Q5_1: (32, 24),
    GType.Q8_0: (32, 34), GType.Q8_1: (32, 36),
    GType.Q4_K: (256, 144), GType.Q6_K: (256, 210),
    GType.Q8_K: (256, 292),
}


# --- wire → planar numpy conversion --------------------------------------

def _nibbles_split_half(qs_bytes):
    """u8[nb,16] → int32[nb,32] in element order (modern ggml split-half)."""
    lo = (qs_bytes & 0xF).astype(np.int32)
    hi = (qs_bytes >> 4).astype(np.int32)
    return np.concatenate([lo, hi], axis=-1)


def _to_storage_np(vals, bs):
    """Element order → storage order (see quant.formats.to_storage_order)."""
    *lead, n = vals.shape
    return vals.reshape(*lead, n // bs, bs).swapaxes(-1, -2).reshape(*lead, n)


def _from_storage_np(vals, bs):
    *lead, n = vals.shape
    return vals.reshape(*lead, bs, n // bs).swapaxes(-1, -2).reshape(*lead, n)


def _kq_fused_np(d, sc, per):
    """f16 fused subblock scales (matches quant.quantize._kq_fused_scales)."""
    dd = np.repeat(d.astype(np.float32), per, axis=-1)
    return (dd * sc.astype(np.float32)).astype(np.float16)


def _pack_planar_np(vals, bits):
    """numpy planar pack matching quant.formats.pack_nibbles/pack_2bit."""
    *lead, n = vals.shape
    per = 32 // bits
    planes = vals.astype(np.uint32).reshape(*lead, per, n // per)
    out = np.zeros((*lead, n // per), np.uint32)
    for j in range(per):
        out |= planes[..., j, :] << np.uint32(bits * j)
    return out


def _unpack_planar_np(packed, n, bits):
    *lead, nw = packed.shape
    per = 32 // bits
    mask = np.uint32((1 << bits) - 1)
    parts = [((packed >> np.uint32(bits * j)) & mask) for j in range(per)]
    return np.concatenate(parts, axis=-1).astype(np.int32)


def _add_pair_planes_np(qt: QTensor) -> QTensor:
    """numpy analog of quant.quantize.add_scale_pair_planes."""
    names = ("kd", "km") if "kd" in qt.planes else ("d", "m")
    for name in names:
        v = qt.planes.get(name)
        if v is not None and v.dtype == np.float16 and v.shape[-1] % 2 == 0:
            c = v.shape[-1]
            bits = v.view(np.uint16).astype(np.uint32)
            qt.planes[name + "_p"] = (
                bits[..., : c // 2] | (bits[..., c // 2 :] << np.uint32(16))
            )
    return qt


def qtensor_from_wire(gtype: GType, raw: bytes, shape) -> "QTensor | np.ndarray":
    """Parse ggml wire blocks into planar QTensor planes (numpy arrays;
    convert with jnp.asarray when placing on device)."""
    n = int(np.prod(shape))
    rows = n // shape[-1]
    k = shape[-1]

    if gtype == GType.F32:
        return np.frombuffer(raw, np.float32).reshape(shape).copy()
    if gtype == GType.F16:
        return np.frombuffer(raw, np.float16).reshape(shape).copy()

    bs, bb = WIRE_BLOCK_BYTES[gtype]
    nb = k // bs
    buf = np.frombuffer(raw, np.uint8).reshape(rows, nb, bb)

    def f16(sl):
        return sl.copy().view(np.float16).reshape(rows, nb)

    if gtype == GType.Q8_0:
        d = f16(buf[:, :, 0:2])
        qs = buf[:, :, 2:34].view(np.int8).reshape(rows, k)
        return _add_pair_planes_np(QTensor(gtype, tuple(shape),
                       {"qs": _to_storage_np(qs.copy(), 32), "d": d}))
    if gtype == GType.Q8_1:
        # wire block_q8_1 {f16 d, f16 s, i8 qs[32]}; canonical planes keep
        # d/s in f32 (quantize_row_q8_1 convention)
        d = f16(buf[:, :, 0:2]).astype(np.float32)
        s = f16(buf[:, :, 2:4]).astype(np.float32)
        qs = buf[:, :, 4:36].view(np.int8).reshape(rows, k)
        return QTensor(gtype, tuple(shape),
                       {"qs": _to_storage_np(qs.copy(), 32), "d": d, "s": s})
    if gtype == GType.Q8_K:
        # wire block_q8_K {f32 d, i8 qs[256], i16 bsums[16]}; qs stays in
        # element order (activation-side format, quantize_row_q8_k)
        d = buf[:, :, 0:4].copy().view(np.float32).reshape(rows, nb)
        qs = buf[:, :, 4:260].view(np.int8).reshape(rows, k)
        bsums = buf[:, :, 260:292].copy().view(np.int16).reshape(rows, nb * 16)
        return QTensor(gtype, tuple(shape),
                       {"qs": qs.copy(), "d": d, "bsums": bsums})
    if gtype in (GType.Q4_0, GType.Q4_1):
        off = 2 if gtype == GType.Q4_0 else 4
        d = f16(buf[:, :, 0:2])
        vals = _nibbles_split_half(buf[:, :, off : off + 16]).reshape(rows, k)
        planes = {"qs": _pack_planar_np(_to_storage_np(vals, 32), 4), "d": d}
        if gtype == GType.Q4_1:
            planes["m"] = f16(buf[:, :, 2:4])
        return _add_pair_planes_np(QTensor(gtype, tuple(shape), planes))
    if gtype in (GType.Q5_0, GType.Q5_1):
        off = 2 if gtype == GType.Q5_0 else 4
        d = f16(buf[:, :, 0:2])
        qh = buf[:, :, off : off + 4].copy().view(np.uint32).reshape(rows, nb)
        lo = _nibbles_split_half(buf[:, :, off + 4 : off + 20])  # [rows, nb, 32]
        bits = ((qh[..., None] >> np.arange(32, dtype=np.uint32)) & 1).astype(np.int32)
        q5 = lo | (bits << 4)
        planes = {
            "qs": _pack_planar_np(
                _to_storage_np((q5 & 0xF).reshape(rows, k), 32), 4),
            "qh": _pack_high_bits_np(q5),
            "d": d,
        }
        if gtype == GType.Q5_1:
            planes["m"] = f16(buf[:, :, 2:4])
        return _add_pair_planes_np(QTensor(gtype, tuple(shape), planes))
    if gtype == GType.Q4_K:
        d = f16(buf[:, :, 0:2])
        dmin = f16(buf[:, :, 2:4])
        scales = buf[:, :, 4:16]  # [rows, nb, 12]
        sc, m = _unpack_kq_scales(scales)  # each [rows, nb, 8]
        qs = buf[:, :, 16:144]  # [rows, nb, 128] = 4 groups of 32 bytes
        # each 32-byte group covers 64 elems: lo nibbles = elems 0-31 of the
        # group, hi nibbles = elems 32-63
        grp = qs.reshape(rows, nb, 4, 32)
        lo = (grp & 0xF).astype(np.int32)
        hi = (grp >> 4).astype(np.int32)
        vals = np.concatenate([lo, hi], axis=-1).reshape(rows, k)
        sc8 = sc.reshape(rows, nb * 8).astype(np.uint8)
        m8 = m.reshape(rows, nb * 8).astype(np.uint8)
        return _add_pair_planes_np(QTensor(gtype, tuple(shape), {
            "qs": _pack_planar_np(_to_storage_np(vals, 32), 4),
            "d": d, "dmin": dmin, "sc": sc8, "m": m8,
            "kd": _kq_fused_np(d, sc8, 8),
            "km": _kq_fused_np(dmin, m8, 8),
        }))
    if gtype == GType.Q6_K:
        ql = buf[:, :, 0:128]
        qh = buf[:, :, 128:192]
        scales = buf[:, :, 192:208].view(np.int8)
        d = f16(buf[:, :, 208:210])
        # per 128-elem half: elems l, l+32, l+64, l+96 from ql/qh (llama.cpp)
        vals = np.zeros((ql.shape[0], ql.shape[1], 256), np.int32)
        for half in range(2):
            qlh = ql[:, :, half * 64 : (half + 1) * 64].astype(np.int32)
            qhh = qh[:, :, half * 32 : (half + 1) * 32].astype(np.int32)
            base = half * 128
            l = np.arange(32)
            vals[:, :, base + l] = (qlh[:, :, l] & 0xF) | (((qhh[:, :, l] >> 0) & 3) << 4)
            vals[:, :, base + l + 32] = (qlh[:, :, l + 32] & 0xF) | (((qhh[:, :, l] >> 2) & 3) << 4)
            vals[:, :, base + l + 64] = (qlh[:, :, l] >> 4) | (((qhh[:, :, l] >> 4) & 3) << 4)
            vals[:, :, base + l + 96] = (qlh[:, :, l + 32] >> 4) | (((qhh[:, :, l] >> 6) & 3) << 4)
        flat = _to_storage_np(vals.reshape(rows, k), 16)
        sc16 = scales.reshape(rows, nb * 16).copy()
        return _add_pair_planes_np(QTensor(gtype, tuple(shape), {
            "ql": _pack_planar_np(flat & 0xF, 4),
            "qh": _pack_planar_np(flat >> 4, 2),
            "d": d,
            "sc": sc16,
            "kd": _kq_fused_np(d, sc16, 16),
        }))
    raise ValueError(f"unsupported wire type {gtype}")


def _pack_high_bits_np(q5):
    """[rows, nb, 32] → uint32 qh bitmask per block (canonical Q5 plane)."""
    hb = ((q5 >> 4) & 1).astype(np.uint32)
    out = np.zeros(q5.shape[:-1], np.uint32)
    for l in range(32):
        out |= hb[..., l] << np.uint32(l)
    return out


def _unpack_kq_scales(scales):
    """llama.cpp get_scale_min_k4: 12 bytes → 8× (6-bit sc, 6-bit m)."""
    s = scales.astype(np.int32)
    sc = np.zeros((*scales.shape[:-1], 8), np.int32)
    m = np.zeros_like(sc)
    for j in range(8):
        if j < 4:
            sc[..., j] = s[..., j] & 63
            m[..., j] = s[..., j + 4] & 63
        else:
            sc[..., j] = (s[..., j + 4] & 0xF) | ((s[..., j - 4] >> 6) << 4)
            m[..., j] = (s[..., j + 4] >> 4) | ((s[..., j] >> 6) << 4)
    return sc, m


def _pack_kq_scales(sc, m):
    """Inverse of _unpack_kq_scales."""
    out = np.zeros((*sc.shape[:-1], 12), np.uint8)
    sc = sc.astype(np.int32)
    m = m.astype(np.int32)
    for j in range(4):
        out[..., j] = (sc[..., j] & 63) | ((sc[..., j + 4] >> 4) << 6)
        out[..., j + 4] = (m[..., j] & 63) | ((m[..., j + 4] >> 4) << 6)
        out[..., j + 8] = (sc[..., j + 4] & 0xF) | ((m[..., j + 4] & 0xF) << 4)
    return out


def qtensor_to_wire(qt_or_arr) -> tuple[GType, bytes]:
    """Canonical → ggml wire blocks (for GGUF export)."""
    if isinstance(qt_or_arr, np.ndarray):
        arr = qt_or_arr
        if arr.dtype == np.float32:
            return GType.F32, arr.tobytes()
        if arr.dtype == np.float16:
            return GType.F16, arr.tobytes()
        raise ValueError(arr.dtype)
    qt = qt_or_arr
    g = qt.gtype
    planes = {k: np.asarray(v) for k, v in qt.planes.items()}
    rows = int(np.prod(qt.shape[:-1]))
    k = qt.shape[-1]
    bs, bb = WIRE_BLOCK_BYTES[g]
    nb = k // bs
    out = np.zeros((rows, nb, bb), np.uint8)

    def put_f16(sl, vals):
        sl[...] = vals.astype(np.float16).reshape(rows, nb, 1).view(np.uint8)

    if g == GType.Q8_0:
        put_f16(out[:, :, 0:2], planes["d"])
        qs = _from_storage_np(planes["qs"], 32)
        out[:, :, 2:34] = qs.view(np.uint8).reshape(rows, nb, 32)
        return g, out.tobytes()
    if g == GType.Q8_1:
        put_f16(out[:, :, 0:2], planes["d"])
        put_f16(out[:, :, 2:4], planes["s"])
        qs = _from_storage_np(planes["qs"], 32)
        out[:, :, 4:36] = qs.view(np.uint8).reshape(rows, nb, 32)
        return g, out.tobytes()
    if g == GType.Q8_K:
        out[:, :, 0:4] = planes["d"].astype(np.float32).reshape(
            rows, nb, 1).view(np.uint8)
        out[:, :, 4:260] = planes["qs"].astype(np.int8).reshape(
            rows, nb, 256).view(np.uint8)
        out[:, :, 260:292] = planes["bsums"].astype(np.int16).reshape(
            rows, nb, 16).view(np.uint8)
        return g, out.tobytes()
    if g in (GType.Q4_0, GType.Q4_1):
        off = 2 if g == GType.Q4_0 else 4
        put_f16(out[:, :, 0:2], planes["d"])
        if g == GType.Q4_1:
            put_f16(out[:, :, 2:4], planes["m"])
        vals = _from_storage_np(
            _unpack_planar_np(planes["qs"], k, 4), 32).reshape(rows, nb, 32)
        out[:, :, off : off + 16] = (vals[:, :, :16] | (vals[:, :, 16:] << 4)).astype(np.uint8)
        return g, out.tobytes()
    if g in (GType.Q5_0, GType.Q5_1):
        off = 2 if g == GType.Q5_0 else 4
        put_f16(out[:, :, 0:2], planes["d"])
        if g == GType.Q5_1:
            put_f16(out[:, :, 2:4], planes["m"])
        lo = _from_storage_np(
            _unpack_planar_np(planes["qs"], k, 4), 32).reshape(rows, nb, 32)
        qh = planes["qh"].reshape(rows, nb)
        out[:, :, off : off + 4] = qh.view(np.uint8).reshape(rows, nb, 4)
        out[:, :, off + 4 : off + 20] = (lo[:, :, :16] | (lo[:, :, 16:] << 4)).astype(np.uint8)
        return g, out.tobytes()
    if g == GType.Q4_K:
        put_f16(out[:, :, 0:2], planes["d"])
        put_f16(out[:, :, 2:4], planes["dmin"])
        sc = planes["sc"].reshape(rows, nb, 8)
        m = planes["m"].reshape(rows, nb, 8)
        out[:, :, 4:16] = _pack_kq_scales(sc, m)
        vals = _from_storage_np(
            _unpack_planar_np(planes["qs"], k, 4), 32).reshape(rows, nb, 4, 64)
        qs = (vals[..., :32] | (vals[..., 32:] << 4)).astype(np.uint8)
        out[:, :, 16:144] = qs.reshape(rows, nb, 128)
        return g, out.tobytes()
    if g == GType.Q6_K:
        vals = _from_storage_np(
            _unpack_planar_np(planes["ql"], k, 4)
            | (_unpack_planar_np(planes["qh"], k, 2) << 4), 16
        ).reshape(rows, nb, 256)
        ql = np.zeros((rows, nb, 128), np.uint8)
        qh = np.zeros((rows, nb, 64), np.uint8)
        for half in range(2):
            base = half * 128
            l = np.arange(32)
            q1 = vals[:, :, base + l]
            q2 = vals[:, :, base + l + 32]
            q3 = vals[:, :, base + l + 64]
            q4 = vals[:, :, base + l + 96]
            ql[:, :, half * 64 + l] = (q1 & 0xF) | ((q3 & 0xF) << 4)
            ql[:, :, half * 64 + 32 + l] = (q2 & 0xF) | ((q4 & 0xF) << 4)
            qh[:, :, half * 32 + l] = (
                (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
            )
        out[:, :, 0:128] = ql
        out[:, :, 128:192] = qh
        out[:, :, 192:208] = planes["sc"].reshape(rows, nb, 16).astype(np.int8).view(np.uint8)
        put_f16(out[:, :, 208:210], planes["d"])
        return g, out.tobytes()
    raise ValueError(g)


# --- GGUF container -------------------------------------------------------

@dataclass
class GGUFTensorInfo:
    name: str
    shape: tuple  # numpy order (row-major, last axis = ggml ne[0])
    gtype: GType
    offset: int
    nbytes: int


class GGUFReader:
    """Minimal GGUF v2/v3 reader (mmap-friendly: np.memmap for data)."""

    def __init__(self, path: str):
        self.path = path
        self.metadata: dict = {}
        self.tensors: dict[str, GGUFTensorInfo] = {}
        # mmap the file: header parsing touches only its pages and tensor
        # loads slice straight out of the page cache (no full-file copy —
        # a 7B GGUF is ~4 GB)
        self._data = np.memmap(path, dtype=np.uint8, mode="r")
        self._parse(memoryview(self._data))

    def _parse(self, mv):
        off = 0

        def u(fmt):
            nonlocal off
            sz = struct.calcsize(fmt)
            (v,) = struct.unpack_from("<" + fmt, mv, off)
            off += sz
            return v

        def rd_str():
            n = u("Q")
            nonlocal off
            s = bytes(mv[off : off + n]).decode("utf-8")
            off += n
            return s

        def rd_val(t):
            if t == _T_U8: return u("B")
            if t == _T_I8: return u("b")
            if t == _T_U16: return u("H")
            if t == _T_I16: return u("h")
            if t == _T_U32: return u("I")
            if t == _T_I32: return u("i")
            if t == _T_F32: return u("f")
            if t == _T_BOOL: return bool(u("B"))
            if t == _T_STR: return rd_str()
            if t == _T_U64: return u("Q")
            if t == _T_I64: return u("q")
            if t == _T_F64: return u("d")
            if t == _T_ARR:
                et = u("I")
                n = u("Q")
                return [rd_val(et) for _ in range(n)]
            raise ValueError(t)

        assert bytes(mv[:4]) == MAGIC, "not a GGUF file"
        off = 4
        version = u("I")
        assert version in (2, 3), version
        n_tensors = u("Q")
        n_kv = u("Q")
        for _ in range(n_kv):
            key = rd_str()
            t = u("I")
            self.metadata[key] = rd_val(t)
        infos = []
        for _ in range(n_tensors):
            name = rd_str()
            nd = u("I")
            dims = [u("Q") for _ in range(nd)]  # ne[] order (ne0 first)
            wire_t = u("I")
            toff = u("Q")
            shape = tuple(reversed(dims))
            infos.append((name, shape, GGML_WIRE[wire_t], toff))
        align = self.metadata.get("general.alignment", 32)
        data_start = (off + align - 1) // align * align
        for name, shape, g, toff in infos:
            bs, bb = WIRE_BLOCK_BYTES[g]
            nbytes = int(np.prod(shape)) // bs * bb
            self.tensors[name] = GGUFTensorInfo(
                name, shape, g, data_start + toff, nbytes
            )

    def load(self, name: str, use_native: bool = True):
        """→ planar QTensor (quantized) or numpy array (float). Uses the
        multithreaded C++ repacker when built (io.native), numpy otherwise."""
        ti = self.tensors[name]
        raw = self._data[ti.offset : ti.offset + ti.nbytes]
        if use_native and ti.gtype not in (GType.F32, GType.F16):
            from . import native

            qt = native.repack_from_wire(ti.gtype, raw, ti.shape)
            if qt is not None:
                return qt
        return qtensor_from_wire(ti.gtype, raw, ti.shape)


class GGUFWriter:
    """Minimal GGUF v3 writer (round-trip/testing + model export)."""

    def __init__(self):
        self.metadata: list[tuple[str, int, object]] = []
        self.tensors: list[tuple[str, GType, tuple, bytes]] = []

    def add_meta(self, key: str, vtype: int, value):
        self.metadata.append((key, vtype, value))

    def add_tensor(self, name: str, qt_or_arr):
        g, raw = qtensor_to_wire(qt_or_arr)
        shape = qt_or_arr.shape
        self.tensors.append((name, g, tuple(shape), raw))

    def write(self, path: str, align: int = 32):
        out = bytearray()
        out += MAGIC
        out += struct.pack("<I", 3)
        out += struct.pack("<Q", len(self.tensors))
        out += struct.pack("<Q", len(self.metadata) + 1)

        def w_str(s):
            b = s.encode("utf-8")
            out.extend(struct.pack("<Q", len(b)))
            out.extend(b)

        def w_val(t, v):
            fmt = {_T_U8: "B", _T_I8: "b", _T_U16: "H", _T_I16: "h",
                   _T_U32: "I", _T_I32: "i", _T_F32: "f", _T_U64: "Q",
                   _T_I64: "q", _T_F64: "d"}.get(t)
            if t == _T_BOOL:
                out.extend(struct.pack("<B", int(v)))
            elif t == _T_STR:
                w_str(v)
            elif t == _T_ARR:
                et, items = v  # value = (element_type, list)
                out.extend(struct.pack("<I", et))
                out.extend(struct.pack("<Q", len(items)))
                for it in items:
                    w_val(et, it)
            elif fmt:
                out.extend(struct.pack("<" + fmt, v))
            else:
                raise ValueError(t)

        w_str("general.alignment")
        out.extend(struct.pack("<I", _T_U32))
        out.extend(struct.pack("<I", align))
        for key, t, v in self.metadata:
            w_str(key)
            out.extend(struct.pack("<I", t))
            w_val(t, v)

        offset = 0
        blobs = []
        for name, g, shape, raw in self.tensors:
            w_str(name)
            dims = tuple(reversed(shape))
            out.extend(struct.pack("<I", len(dims)))
            for d in dims:
                out.extend(struct.pack("<Q", d))
            out.extend(struct.pack("<I", WIRE_ID[g]))
            out.extend(struct.pack("<Q", offset))
            pad = (-len(raw)) % align
            blobs.append(raw + b"\0" * pad)
            offset += len(raw) + pad
        pad = (-len(out)) % align
        out += b"\0" * pad
        for b in blobs:
            out += b
        with open(path, "wb") as f:
            f.write(bytes(out))


# --- llama.cpp name mapping ----------------------------------------------

def load_gguf_llama(path: str):
    """Load a llama.cpp GGUF into (LlamaConfig, params tree). Arrays stay
    numpy/QTensor-of-numpy; call parallel.shard_params or jax.device_put to
    place them."""
    from ..models.llama import LlamaConfig

    r = GGUFReader(path)
    md = r.metadata
    arch = md.get("general.architecture", "llama")
    g = lambda k, d=None: md.get(f"{arch}.{k}", d)
    n_layer = g("block_count")
    cfg = LlamaConfig(
        n_vocab=r.tensors["token_embd.weight"].shape[0],
        n_ctx=g("context_length", 2048),
        n_embd=g("embedding_length"),
        n_head=g("attention.head_count"),
        n_head_kv=g("attention.head_count_kv", g("attention.head_count")),
        n_layer=n_layer,
        n_ff=g("feed_forward_length"),
        rms_eps=g("attention.layer_norm_rms_epsilon", 1e-6),
        rope_base=g("rope.freq_base", 10000.0),
        tie_lm_head="output.weight" not in r.tensors,
    )
    params = {
        "tok_embd": r.load("token_embd.weight"),
        "norm": r.load("output_norm.weight"),
        "output": r.load("output.weight") if "output.weight" in r.tensors else None,
        "blocks": [],
    }
    for i in range(n_layer):
        p = f"blk.{i}."
        params["blocks"].append({
            "attn_norm": r.load(p + "attn_norm.weight"),
            "wq": r.load(p + "attn_q.weight"),
            "wk": r.load(p + "attn_k.weight"),
            "wv": r.load(p + "attn_v.weight"),
            "wo": r.load(p + "attn_output.weight"),
            "ffn_norm": r.load(p + "ffn_norm.weight"),
            "w_gate": r.load(p + "ffn_gate.weight"),
            "w_up": r.load(p + "ffn_up.weight"),
            "w_down": r.load(p + "ffn_down.weight"),
        })
    return cfg, params


def _np_of(x):
    """Host copies for the writer (QTensor planes included)."""
    if isinstance(x, QTensor):
        if any(k.endswith("_t") for k in x.planes):
            raise ValueError(
                "GGUF export needs (N, .)-row-layout planes; this QTensor "
                "is in the SWAR transposed kernel layout — quantize with "
                "swar=False for export (quantize_params(..., swar=False))")
        return QTensor(x.gtype, x.shape,
                       {k: np.asarray(v) for k, v in x.planes.items()})
    return np.asarray(x, np.float32)


def save_gguf_llama(path: str, cfg, params, tokenizer=None):
    """Write a llama-arch GGUF (llama.cpp tensor naming; QTensor planes
    repacked to wire blocks by GGUFWriter). `tokenizer`: an
    io.tokenizer.SPMTokenizer (or (tokens, scores) pair) embedded under
    the llama.cpp tokenizer.ggml.* keys, so the file is self-contained
    for the GGUF->tokenize->perplexity chain (io.tokenizer.from_gguf)."""
    w = GGUFWriter()
    w.add_meta("general.architecture", 8, "llama")
    for key, t, v in [("block_count", 4, cfg.n_layer),
                      ("context_length", 4, cfg.n_ctx),
                      ("embedding_length", 4, cfg.n_embd),
                      ("attention.head_count", 4, cfg.n_head),
                      ("attention.head_count_kv", 4, cfg.n_head_kv),
                      ("feed_forward_length", 4, cfg.n_ff)]:
        w.add_meta(f"llama.{key}", t, v)
    if tokenizer is not None:
        toks, scores = (
            (tokenizer.tokens, tokenizer.scores)
            if hasattr(tokenizer, "tokens") else tokenizer)
        w.add_meta("tokenizer.ggml.model", 8, "llama")
        w.add_meta("tokenizer.ggml.tokens", 9, (8, [str(t) for t in toks]))
        w.add_meta("tokenizer.ggml.scores", 9,
                   (6, [float(s) for s in scores]))
        for key, val in [("bos_token_id", getattr(tokenizer, "bos_id", 1)),
                         ("eos_token_id", getattr(tokenizer, "eos_id", 2)),
                         ("unknown_token_id",
                          getattr(tokenizer, "unk_id", 0))]:
            w.add_meta(f"tokenizer.ggml.{key}", 4, int(val))
    names = [("token_embd.weight", params["tok_embd"]),
             ("output_norm.weight", params["norm"])]
    if params.get("output") is not None:
        names.append(("output.weight", params["output"]))
    for i, b in enumerate(params["blocks"]):
        for nm, key in [("attn_norm", "attn_norm"), ("attn_q", "wq"),
                        ("attn_k", "wk"), ("attn_v", "wv"),
                        ("attn_output", "wo"), ("ffn_norm", "ffn_norm"),
                        ("ffn_gate", "w_gate"), ("ffn_up", "w_up"),
                        ("ffn_down", "w_down")]:
            names.append((f"blk.{i}.{nm}.weight", b[key]))
    for name, t in names:
        w.add_tensor(name, _np_of(t))
    w.write(path)


def save_gguf_gptj(path: str, cfg, params):
    """Write a gptj-arch GGUF (llama.cpp gptj tensor naming)."""
    w = GGUFWriter()
    w.add_meta("general.architecture", 8, "gptj")
    for key, t, v in [("block_count", 4, cfg.n_layer),
                      ("context_length", 4, cfg.n_ctx),
                      ("embedding_length", 4, cfg.n_embd),
                      ("attention.head_count", 4, cfg.n_head),
                      ("rope.dimension_count", 4, cfg.rotary_dim)]:
        w.add_meta(f"gptj.{key}", t, v)
    w.add_meta("gptj.attention.layer_norm_epsilon", 6, float(cfg.ln_eps))
    names = [
        ("token_embd.weight", params["wte"]),
        ("output_norm.weight", params["ln_f"]["g"]),
        ("output_norm.bias", params["ln_f"]["b"]),
        ("output.weight", params["lm_head"]["w"]),
        ("output.bias", params["lm_head"]["b"]),
    ]
    for i, b in enumerate(params["blocks"]):
        p = f"blk.{i}."
        names += [
            (p + "attn_norm.weight", b["ln_1"]["g"]),
            (p + "attn_norm.bias", b["ln_1"]["b"]),
            (p + "attn_q.weight", b["attn"]["wq"]),
            (p + "attn_k.weight", b["attn"]["wk"]),
            (p + "attn_v.weight", b["attn"]["wv"]),
            (p + "attn_output.weight", b["attn"]["wo"]),
            (p + "ffn_up.weight", b["mlp"]["fc_in_w"]),
            (p + "ffn_up.bias", b["mlp"]["fc_in_b"]),
            (p + "ffn_down.weight", b["mlp"]["fc_out_w"]),
            (p + "ffn_down.bias", b["mlp"]["fc_out_b"]),
        ]
    for name, t in names:
        w.add_tensor(name, _np_of(t))
    w.write(path)


def load_gguf_gptj(path: str):
    """Load a gptj-arch GGUF into (GPTJConfig, params tree)."""
    from ..models.gptj import GPTJConfig

    r = GGUFReader(path)
    md = r.metadata
    g = lambda k, d=None: md.get(f"gptj.{k}", d)
    n_layer = g("block_count")
    cfg = GPTJConfig(
        n_vocab=r.tensors["token_embd.weight"].shape[0],
        n_ctx=g("context_length", 2048),
        n_embd=g("embedding_length"),
        n_head=g("attention.head_count"),
        n_layer=n_layer,
        rotary_dim=g("rope.dimension_count", 64),
        ln_eps=g("attention.layer_norm_epsilon", 1e-5),
    )
    emb = r.load("token_embd.weight")
    params = {
        "wte": emb,
        "ln_f": {"g": r.load("output_norm.weight"),
                 "b": r.load("output_norm.bias")},
        "lm_head": {
            "w": r.load("output.weight")
            if "output.weight" in r.tensors else emb,
            "b": r.load("output.bias")
            if "output.bias" in r.tensors
            else np.zeros((cfg.n_vocab,), np.float32),
        },
        "blocks": [],
    }
    for i in range(n_layer):
        p = f"blk.{i}."
        params["blocks"].append({
            "ln_1": {"g": r.load(p + "attn_norm.weight"),
                     "b": r.load(p + "attn_norm.bias")},
            "attn": {
                "wq": r.load(p + "attn_q.weight"),
                "wk": r.load(p + "attn_k.weight"),
                "wv": r.load(p + "attn_v.weight"),
                "wo": r.load(p + "attn_output.weight"),
            },
            "mlp": {
                "fc_in_w": r.load(p + "ffn_up.weight"),
                "fc_in_b": r.load(p + "ffn_up.bias"),
                "fc_out_w": r.load(p + "ffn_down.weight"),
                "fc_out_b": r.load(p + "ffn_down.bias"),
            },
        })
    return cfg, params
