"""Block-quantized tensor containers (TPU-canonical layout).

The reference stores quantization blocks as interleaved C structs
(`block_q4_0{float d; u8 qs[16]}` etc., TypeDefinitions.cs:236-290). On TPU we
store structure-of-arrays planes instead:

  * ``qs`` — packed integer payload. 4-bit formats pack 8 nibbles per
    ``uint32`` lane (element ``e`` of a row lives in word ``e // 8``, bits
    ``4 * (e % 8)``); 8-bit formats keep plain ``int8``. TPUs have no sub-byte
    loads, and XLA/Pallas unpack uint32 lanes with shifts at full VPU rate.
  * ``d`` / ``m`` / ``qh`` / ... — per-block scale/min/high-bit planes.

All planes share leading dims with the logical tensor; blocks run along the
last axis. A ``QTensor`` is a registered pytree so it flows through jit/vmap/
shard_map; ``gtype`` and logical ``shape`` are static (aux) data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dtypes import GType, TYPE_TRAITS, block_size


class QTensor:
    """A block-quantized tensor: static (gtype, shape) + array planes."""

    __slots__ = ("gtype", "shape", "planes")

    def __init__(self, gtype: GType, shape: tuple, planes: dict):
        self.gtype = GType(gtype)
        self.shape = tuple(shape)
        self.planes = dict(planes)

    # --- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (self.gtype, self.shape, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        gtype, shape, keys = aux
        return cls(gtype, shape, dict(zip(keys, children)))

    # --- convenience -----------------------------------------------------
    def __getitem__(self, k):
        return self.planes[k]

    @property
    def ndim(self):
        return len(self.shape)

    def nbytes_wire(self) -> int:
        """ggml_nbytes parity: wire bytes of the equivalent ggml blocks."""
        from ..dtypes import row_size_bytes

        n = 1
        for s in self.shape:
            n *= s
        per_row = row_size_bytes(self.gtype, self.shape[-1])
        return per_row * (n // self.shape[-1])

    def __repr__(self):
        pl = {k: (tuple(v.shape), str(v.dtype)) for k, v in self.planes.items()}
        return f"QTensor({TYPE_TRAITS[self.gtype].name}, shape={self.shape}, planes={pl})"


jax.tree_util.register_pytree_node_class(QTensor)


# --- nibble packing ------------------------------------------------------

def pack_nibbles(vals: jnp.ndarray) -> jnp.ndarray:
    """Pack uint4 values (int32/uint8 in [0,15], last axis multiple of 8)
    into uint32 lanes — PLANAR layout: bits [4j, 4j+4) of word w hold
    original element j·(n/8) + w.

    Why planar (vs the byte-contiguous ggml wire layout): a Pallas kernel
    unpacks a planar row with 8 lane-wise shift/mask ops and ONE concat along
    the lane axis — no (N, n/8, 8)→(N, n) relayout, which Mosaic would have
    to do with sublane shuffles. Wire-format conversion happens at import
    time (io.gguf) where layout is free.
    """
    *lead, n = vals.shape
    assert n % 8 == 0, n
    planes = vals.astype(jnp.uint32).reshape(*lead, 8, n // 8)
    out = planes[..., 0, :] << 0
    for j in range(1, 8):
        out = out | (planes[..., j, :] << jnp.uint32(4 * j))
    return out


def unpack_nibbles(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse of pack_nibbles → int32 values in [0,15], shape (..., n)."""
    *lead, nw = packed.shape
    assert nw * 8 == n, (nw, n)
    parts = [
        ((packed >> jnp.uint32(4 * j)) & jnp.uint32(0xF)) for j in range(8)
    ]
    return jnp.concatenate(parts, axis=-1).astype(jnp.int32)


def pack_2bit(vals: jnp.ndarray) -> jnp.ndarray:
    """2-bit planar pack: 16 planes of n/16 (same scheme as pack_nibbles)."""
    *lead, n = vals.shape
    assert n % 16 == 0
    planes = vals.astype(jnp.uint32).reshape(*lead, 16, n // 16)
    out = planes[..., 0, :]
    for j in range(1, 16):
        out = out | (planes[..., j, :] << jnp.uint32(2 * j))
    return out


def unpack_2bit(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    *lead, nw = packed.shape
    assert nw * 16 == n
    parts = [
        ((packed >> jnp.uint32(2 * j)) & jnp.uint32(0x3)) for j in range(16)
    ]
    return jnp.concatenate(parts, axis=-1).astype(jnp.int32)


def pack_bytes_u32(vals: jnp.ndarray) -> jnp.ndarray:
    """Pack uint8 values (last axis multiple of 4) into uint32 lanes."""
    *lead, n = vals.shape
    assert n % 4 == 0
    v = vals.astype(jnp.uint32).reshape(*lead, n // 4, 4)
    shifts = (jnp.arange(4, dtype=jnp.uint32) * 8).reshape((1,) * (len(lead) + 1) + (4,))
    return _or_reduce(v << shifts)


def unpack_bytes_u32(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    *lead, nw = packed.shape
    assert nw * 4 == n
    shifts = (jnp.arange(4, dtype=jnp.uint32) * 8).reshape((1,) * (len(lead) + 1) + (4,))
    vals = (packed[..., None] >> shifts) & jnp.uint32(0xFF)
    return vals.reshape(*lead, n).astype(jnp.int32)


def to_storage_order(vals: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Element order → storage order: (..., nb·bs) with element c·bs+l moved
    to position l·nb+c (transpose of the (nb, bs) block matrix).

    Why: in a Pallas kernel, expanding per-block scales to per-element then
    becomes a lane-axis TILE (`pltpu.repeat`), and 5th-bit masks expand with
    shift+concat — both natively supported; the element-order equivalent
    needs (N, nb, bs)→(N, k) shape casts Mosaic refuses. `bs` is the format's
    finest scale granularity (32 legacy/Q4_K, 16 for Q4_2/Q4_3/Q6_K).
    """
    *lead, n = vals.shape
    return vals.reshape(*lead, n // bs, bs).swapaxes(-1, -2).reshape(*lead, n)


def from_storage_order(vals: jnp.ndarray, bs: int) -> jnp.ndarray:
    *lead, n = vals.shape
    return vals.reshape(*lead, bs, n // bs).swapaxes(-1, -2).reshape(*lead, n)


def pack_f16_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """f16 scale plane (..., C) → uint32 (..., C/2), word w = (x[w], x[w+C/2])
    in (lo, hi) halves — planar, so an in-kernel lo/hi split + concat
    reconstructs block order. Exists because Mosaic (this libtpu) has no f16
    vector type; kernels decode the halves to f32 with integer lane math
    (kernels.matmul_q._decode_f16x2)."""
    *lead, c = x.shape
    assert c % 2 == 0, c
    bits = jax.lax.bitcast_convert_type(
        x.astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)
    return bits[..., : c // 2] | (bits[..., c // 2 :] << jnp.uint32(16))


def unpack_f16_pairs(packed: jnp.ndarray, c: int) -> jnp.ndarray:
    lo = (packed & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    hi = (packed >> jnp.uint32(16)).astype(jnp.uint16)
    bits = jnp.concatenate([lo, hi], axis=-1)
    return jax.lax.bitcast_convert_type(bits, jnp.float16)


def concat_qtensors(qts: list) -> "QTensor | jnp.ndarray":
    """Concatenate tensors along the row axis (axis 0). All inputs must be
    2-D and share gtype/K/plane keys (QTensors) or dtype/K (dense arrays).

    Since quantization is row-independent, concat(quantize(a), quantize(b))
    is bit-identical to quantize(concat(a, b)) — used to fuse wq/wk/wv (and
    gate/up) into one kernel launch per group (per-pallas-call overhead is
    ~10-15 µs on this chip; a 7B decode step had 225 calls)."""
    if not isinstance(qts[0], QTensor):
        return jnp.concatenate(qts, axis=0)
    g = qts[0].gtype
    keys = set(qts[0].planes)
    k = qts[0].shape[-1]
    for t in qts[1:]:
        if not isinstance(t, QTensor) or t.gtype != g or t.shape[-1] != k \
                or set(t.planes) != keys:
            raise ValueError("incompatible QTensors for row-concat")
    n = sum(t.shape[0] for t in qts)
    planes = {
        key: jnp.concatenate([t.planes[key] for t in qts], axis=0)
        for key in qts[0].planes
    }
    return QTensor(g, (n, k), planes)


def repack_k_chunks(qt: "QTensor", n_chunks: int) -> "QTensor":
    """Repack a 2-D QTensor so each of `n_chunks` equal logical-K chunks is
    packed STANDALONE (per-chunk planar layout), concatenated along the
    plane axis. BIT-IDENTICAL values and scales — only the packaging moves.

    Why: the planar pack entangles a whole row (word w holds nibble-plane
    samples from across all of K), so slicing a plane's last axis is NOT a
    logical K-slice. After this repack it is: slicing plane columns
    [d·W/D, (d+1)·W/D) yields a standalone valid QTensor for logical
    elements [d·K/D, (d+1)·K/D) — exactly what tensor-parallel K-sharding
    (P(None, 'model') on every plane) hands each device under shard_map.
    Supported: Q4_0 / Q4_1 / Q8_0 (the TP decode formats).
    """
    n, K = qt.shape
    D = n_chunks
    assert K % (D * 32) == 0, (K, D)
    Kc = K // D
    nbc = Kc // 32
    g = qt.gtype

    def chunk_scale(name):
        d = qt.planes[name]  # (n, nb) f16 — block order, chunk-aligned
        return d, jnp.concatenate(
            [pack_f16_pairs(d[:, i * nbc : (i + 1) * nbc]) for i in range(D)],
            axis=-1,
        )

    planes = {}
    if g in (GType.Q4_0, GType.Q4_1):
        vals = from_storage_order(unpack_nibbles(qt.planes["qs"], K), 32)
        planes["qs"] = jnp.concatenate(
            [
                pack_nibbles(to_storage_order(
                    vals[:, i * Kc : (i + 1) * Kc], 32))
                for i in range(D)
            ],
            axis=-1,
        )
    elif g == GType.Q8_0:
        vals = from_storage_order(qt.planes["qs"], 32)
        planes["qs"] = jnp.concatenate(
            [
                to_storage_order(vals[:, i * Kc : (i + 1) * Kc], 32)
                for i in range(D)
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"repack_k_chunks: unsupported {g}")

    planes["d"], planes["d_p"] = chunk_scale("d")
    if g == GType.Q4_1:
        planes["m"], planes["m_p"] = chunk_scale("m")
    return QTensor(g, (n, K), planes)


# --- SWAR transposed layout (kernels.matmul_q SWAR kernels) ---------------
#
# The planewise kernels unpack nibbles with ~4 VPU ops/element (shift, mask,
# cast, scale-mul, 8 loop iterations). The SWAR layout instead stores the
# packed plane TRANSPOSED — (K/8, N) uint32, weight rows along LANES — so a
# kernel can unpack with two dense ops on whole words:
#
#   lo = P & 0x0F0F0F0F ; hi = (P >> 4) & 0x0F0F0F0F   # 3 ops per 8 elts
#   v  = pltpu.bitcast(lo, int8)                        # (K/2, N) sublanes ×4
#
# Mosaic's 32→8 bitcast expands the SUBLANE axis little-endian-contiguously
# (word row r → int8 rows 4r+b = byte b), and `pltpu.repeat` (used to expand
# per-block scales) has TILE/concat semantics — row i of repeat(d, 16, 0)
# reads d[i mod C]. Both constraints pin the k-order: int8 row i of the lo
# plane must hold logical element k = 32·(i mod C) + 2·(i // C) (block
# c = i mod C interleaved, even slots; hi plane holds k+1). Activations are
# permuted to match OUTSIDE the kernel (swar_permute_x — dot products are
# permutation-invariant). Measured on v5e: 617-660 GB/s effective vs
# 530-550 for the planewise kernel (scripts/probe_swar.py).
#
# Large K is split into `n_chunks` standalone chunks (each block-interleaved
# within itself) so the kernel's f32 intermediates fit VMEM; the kernel
# accumulates over a chunk grid axis.

_SWAR_SCALE_KEYS = {"d": "d_t", "m": "m_t", "kd": "kd_t", "km": "km_t"}

_SWAR_GTYPES_Q4 = ("Q4_0", "Q4_1", "Q4_K")


def swar_pack_values_q8(vals: jnp.ndarray, n_chunks: int = 1) -> jnp.ndarray:
    """Signed int8 values (N, K), element order → transposed
    block-interleaved plane (K/4, N) uint32. The single plane holds every
    element: int8 row i ← logical element 32·(i mod C) + i//C (the Q8 analog
    of the lo/hi rule — blocks interleave so a 32× sublane `pltpu.repeat`
    expands per-block scales), 4 consecutive rows per word (bitcast order)."""
    n, k = vals.shape
    kc = k // n_chunks
    assert kc % 32 == 0, (k, n_chunks)
    c_blocks = kc // 32
    chunks = []
    for j in range(n_chunks):
        v = (vals[:, j * kc : (j + 1) * kc].astype(jnp.int32)
             & 0xFF).astype(jnp.uint32)
        rows = jnp.transpose(
            v.reshape(n, c_blocks, 32), (2, 1, 0)
        ).reshape(kc, n)
        b4 = rows.reshape(kc // 4, 4, n)
        word = b4[:, 0] | (b4[:, 1] << jnp.uint32(8)) \
            | (b4[:, 2] << jnp.uint32(16)) | (b4[:, 3] << jnp.uint32(24))
        chunks.append(word)
    return jnp.concatenate(chunks, axis=0)


def swar_unpack_values_q8(plane: jnp.ndarray, n: int, k: int,
                          n_chunks: int = 1) -> jnp.ndarray:
    """Inverse of swar_pack_values_q8 → int32 (N, K) element order (signed)."""
    kc = k // n_chunks
    c_blocks = kc // 32
    outs = []
    for j in range(n_chunks):
        word = plane[j * (kc // 4) : (j + 1) * (kc // 4)]
        rows = jnp.stack(
            [(word >> jnp.uint32(8 * b)) & jnp.uint32(0xFF) for b in range(4)],
            axis=1,
        ).reshape(kc, n).astype(jnp.int32)
        rows = ((rows ^ 0x80) - 0x80)  # sign-extend int8
        v = rows.reshape(32, c_blocks, n)
        outs.append(jnp.transpose(v, (2, 1, 0)).reshape(n, kc))
    return jnp.concatenate(outs, axis=-1)


def swar_pack_values(vals: jnp.ndarray, n_chunks: int = 1,
                     block: int = 32) -> jnp.ndarray:
    """Nibble values (N, K) int in [0,15], element order → transposed
    block-interleaved plane (K/8, N) uint32 (see module comment). `block`
    is the scale granularity: int8 row i ← element block·(i mod C) +
    2·(i//C), C = kc/block — so `pltpu.repeat(d, block/2, 0)` expands
    per-block scales (32 for the legacy/Q4_K formats, 16 for Q6_K)."""
    n, k = vals.shape
    kc = k // n_chunks
    assert kc % 64 == 0 and kc % block == 0, (k, n_chunks, block)
    c_blocks = kc // block
    chunks = []
    for j in range(n_chunks):
        v = vals[:, j * kc : (j + 1) * kc].astype(jnp.uint32)
        # (N, C, block/2, 2): [n, block c, slot t, parity]
        v4 = v.reshape(n, c_blocks, block // 2, 2)
        # int8 row i = t·C + c  →  (block/2, C) leading, then flatten
        lo = jnp.transpose(v4[..., 0], (2, 1, 0)).reshape(kc // 2, n)
        hi = jnp.transpose(v4[..., 1], (2, 1, 0)).reshape(kc // 2, n)
        bytes_ = lo | (hi << jnp.uint32(4))  # (kc/2, N) one byte each
        b4 = bytes_.reshape(kc // 8, 4, n)
        word = b4[:, 0] | (b4[:, 1] << jnp.uint32(8)) \
            | (b4[:, 2] << jnp.uint32(16)) | (b4[:, 3] << jnp.uint32(24))
        chunks.append(word)
    return jnp.concatenate(chunks, axis=0)


def swar_unpack_values(plane: jnp.ndarray, n: int, k: int,
                       n_chunks: int = 1, block: int = 32) -> jnp.ndarray:
    """Inverse of swar_pack_values → int32 (N, K) element order."""
    kc = k // n_chunks
    c_blocks = kc // block
    outs = []
    for j in range(n_chunks):
        word = plane[j * (kc // 8) : (j + 1) * (kc // 8)]
        bytes_ = jnp.stack(
            [(word >> jnp.uint32(8 * b)) & jnp.uint32(0xFF) for b in range(4)],
            axis=1,
        ).reshape(kc // 2, n)
        lo = (bytes_ & jnp.uint32(0xF)).reshape(block // 2, c_blocks, n)
        hi = (bytes_ >> jnp.uint32(4)).reshape(block // 2, c_blocks, n)
        v4 = jnp.stack([lo, hi], axis=-1)  # (block/2, C, N, 2)
        outs.append(
            jnp.transpose(v4, (2, 1, 0, 3)).reshape(n, kc).astype(jnp.int32)
        )
    return jnp.concatenate(outs, axis=-1)


def swar_pack_qh2(vals: jnp.ndarray, n_chunks: int = 1,
                  block: int = 16) -> jnp.ndarray:
    """2-bit high values (N, K) int in [0,3], element order → transposed
    plane (K/16, N) uint32, 16 fields per word. Field placement inverts the
    kernel's unpack — `concat([bitcast((Q >> 2s) & 0x03030303, int8) for
    s in 0..3], axis=0)` — so concat row j = s·(kc/4) + 4w + b must hold
    the high bits of the element at combined row j ([lo-plane rows;
    hi-plane rows] in swar_pack_values order): value(j) lands in word w,
    byte b, 2-bit field s with j = s·(kc/4) + 4w + b."""
    n, k = vals.shape
    kc = k // n_chunks
    assert kc % 64 == 0 and kc % block == 0, (k, n_chunks, block)
    c_blocks = kc // block
    chunks = []
    for j in range(n_chunks):
        v = vals[:, j * kc : (j + 1) * kc].astype(jnp.uint32)
        v4 = v.reshape(n, c_blocks, block // 2, 2)
        lo = jnp.transpose(v4[..., 0], (2, 1, 0)).reshape(kc // 2, n)
        hi = jnp.transpose(v4[..., 1], (2, 1, 0)).reshape(kc // 2, n)
        H = jnp.concatenate([lo, hi], axis=0)  # (kc, n), combined row j
        Hr = H.reshape(4, kc // 16, 4, n)  # [s, w, b, n]
        word = jnp.zeros((kc // 16, n), jnp.uint32)
        for s in range(4):
            for b in range(4):
                word = word | (Hr[s, :, b] << jnp.uint32(8 * b + 2 * s))
        chunks.append(word)
    return jnp.concatenate(chunks, axis=0)


def swar_unpack_qh2(plane: jnp.ndarray, n: int, k: int,
                    n_chunks: int = 1, block: int = 16) -> jnp.ndarray:
    """Inverse of swar_pack_qh2 → int32 (N, K) element order."""
    kc = k // n_chunks
    c_blocks = kc // block
    outs = []
    for j in range(n_chunks):
        word = plane[j * (kc // 16) : (j + 1) * (kc // 16)]
        Hr = jnp.stack(
            [jnp.stack(
                [(word >> jnp.uint32(8 * b + 2 * s)) & jnp.uint32(3)
                 for b in range(4)], axis=1)
             for s in range(4)], axis=0)  # [s, w, b, n]
        H = Hr.reshape(kc, n)
        lo = H[: kc // 2].reshape(block // 2, c_blocks, n)
        hi = H[kc // 2 :].reshape(block // 2, c_blocks, n)
        v4 = jnp.stack([lo, hi], axis=-1)
        outs.append(
            jnp.transpose(v4, (2, 1, 0, 3)).reshape(n, kc).astype(jnp.int32)
        )
    return jnp.concatenate(outs, axis=-1)


def swar_pack_qh1(vals: jnp.ndarray, n_chunks: int = 1,
                  block: int = 32) -> jnp.ndarray:
    """1-bit high values (N, K) in {0,1}, element order → transposed plane
    (K/32, N) uint32, 32 fields per word. Same inversion contract as
    swar_pack_qh2 but for the kernel's 8-shift unpack —
    `concat([bitcast((Q >> s) & 0x01010101, int8) for s in 0..7], axis=0)`
    — so value(j) lands in word w, byte b, bit s with j = s·(kc/8) + 4w + b
    (combined row order = [lo-plane rows; hi-plane rows])."""
    n, k = vals.shape
    kc = k // n_chunks
    assert kc % 64 == 0 and kc % block == 0, (k, n_chunks, block)
    c_blocks = kc // block
    chunks = []
    for j in range(n_chunks):
        v = vals[:, j * kc : (j + 1) * kc].astype(jnp.uint32)
        v4 = v.reshape(n, c_blocks, block // 2, 2)
        lo = jnp.transpose(v4[..., 0], (2, 1, 0)).reshape(kc // 2, n)
        hi = jnp.transpose(v4[..., 1], (2, 1, 0)).reshape(kc // 2, n)
        H = jnp.concatenate([lo, hi], axis=0)  # (kc, n), combined row j
        Hr = H.reshape(8, kc // 32, 4, n)  # [s, w, b, n]
        word = jnp.zeros((kc // 32, n), jnp.uint32)
        for s in range(8):
            for b in range(4):
                word = word | (Hr[s, :, b] << jnp.uint32(8 * b + s))
        chunks.append(word)
    return jnp.concatenate(chunks, axis=0)


def swar_unpack_qh1(plane: jnp.ndarray, n: int, k: int,
                    n_chunks: int = 1, block: int = 32) -> jnp.ndarray:
    """Inverse of swar_pack_qh1 → int32 (N, K) element order."""
    kc = k // n_chunks
    c_blocks = kc // block
    outs = []
    for j in range(n_chunks):
        word = plane[j * (kc // 32) : (j + 1) * (kc // 32)]
        Hr = jnp.stack(
            [jnp.stack(
                [(word >> jnp.uint32(8 * b + s)) & jnp.uint32(1)
                 for b in range(4)], axis=1)
             for s in range(8)], axis=0)  # [s, w, b, n]
        H = Hr.reshape(kc, n)
        lo = H[: kc // 2].reshape(block // 2, c_blocks, n)
        hi = H[kc // 2 :].reshape(block // 2, c_blocks, n)
        v4 = jnp.stack([lo, hi], axis=-1)
        outs.append(
            jnp.transpose(v4, (2, 1, 0, 3)).reshape(n, kc).astype(jnp.int32)
        )
    return jnp.concatenate(outs, axis=-1)


def swar_pack_scales(d: jnp.ndarray, n_chunks: int = 1) -> jnp.ndarray:
    """f16 scale plane (N, C) block order → transposed f16-pair plane
    (C/2, N) uint32: row c packs (block c, block c + C_c/2) of its chunk, so
    an in-kernel sublane lo/hi split + concat restores block-row order."""
    n, c = d.shape
    cc = c // n_chunks
    assert cc % 2 == 0, (c, n_chunks)
    bits = jax.lax.bitcast_convert_type(
        d.astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)
    chunks = []
    for j in range(n_chunks):
        b = bits[:, j * cc : (j + 1) * cc]
        w = b[:, : cc // 2] | (b[:, cc // 2 :] << jnp.uint32(16))
        chunks.append(w.T)
    return jnp.concatenate(chunks, axis=0)


def swar_layout(n: int, k: int, budget: int = 13 * 1024 * 1024,
                kt_bytes: int = 6, gtype=None) -> tuple[int, int, int]:
    """Pick (tile, n_chunks, k_padded) jointly for a (N, K) weight.

    Legality: kernels take FULL-K blocks (the k-chunk loop runs inside the
    kernel over static ref slices, kernels.matmul_q._call_kernel_swar); for
    nc > 1, kc = kp/nc must be % 512 == 0 so every in-kernel chunk slice
    lands on (8, 128)-aligned sublane offsets.
    VMEM: the f32 per-chunk unpack intermediates are kt_bytes·kc·tile
    bytes — 4-bit formats 6 (wlo + whi + d16, each (kc/2)·tile·4 B), Q8_0 8
    (w + d16, each kc·tile·4 B) — plus the RESIDENT packed planes
    (≈ kt_bytes/4 · k/2 bytes per tile column: qs dominates at k/2 (4-bit)
    or k (Q8/Q5x's extra planes), double-buffered across N-tile grid
    steps.
    Prefers the largest tile with the fewest chunks. When K itself admits
    only a small tile (k=11008 — 7B w_down — has no 512-divisible chunking,
    so unpadded it lands on tile=128 at 477-555 GB/s vs 617-660 for
    tile 512), K is PADDED up to the next multiple of 512 (kp=11264, 2.3%
    extra weight bytes) — to_swar packs zero blocks (d=0) and mul_mat_swar
    zero-pads activations, so results are unchanged."""
    import os

    from ..kernels.tune import lookup

    tuned = lookup(kt_bytes, n, k, gtype=gtype)
    if tuned is not None:
        return tuned

    pref = int(os.environ.get("GGML_TPU_SWAR_TILE", "512"))
    tiles = [t for t in (pref, 512, 256, 128) if n % t == 0]

    def best(kx):
        # nc candidates: 1, plus every divisor of kx with a 512-multiple kc
        cands = [1] + [d for d in range(2, kx // 512 + 1)
                       if kx % d == 0 and (kx // d) % 512 == 0]
        # resident packed planes per tile column (double-buffered across
        # N-tile grid steps): qs dominates — ~k/2 B for 4-bit (kt 6),
        # ~k B for Q8_0 / Q5x+qh / Q6_K (kt 8); + decode-sized x blocks
        wire_pc = (0.625 if kt_bytes == 6 else 1.0625) * kx
        xbytes = 2 * 8 * kx * 4
        for tile in tiles:
            for nc in cands:
                kc = kx // nc
                if kc % 64 == 0 and (kt_bytes * kc * tile
                                     + 2 * wire_pc * tile
                                     + xbytes) <= budget:
                    return tile, nc
        return None

    r = best(k)
    if r is not None and r[0] == tiles[0]:
        return r[0], r[1], k
    kp = -(-k // 512) * 512
    if kp != k and os.environ.get("GGML_TPU_SWAR_PAD", "1") == "1":
        rp = best(kp)
        if rp is not None and (r is None or rp[0] > r[0]):
            return rp[0], rp[1], kp
    if r is None:
        raise ValueError(f"no valid swar layout for shape ({n}, {k})")
    return r[0], r[1], k


def swar_kt_bytes(gtype: "GType") -> int:
    from ..dtypes import GType

    # Q8_0: w + d16 at full-K rows; Q5x/Q6_K: add the int8 high-bit concat
    return 8 if gtype in (GType.Q8_0, GType.Q5_0, GType.Q5_1,
                          GType.Q6_K) else 6


def to_swar(qt: "QTensor") -> "QTensor":
    """Convert a 2-D Q4_0/Q4_1/Q4_K/Q8_0 QTensor to the SWAR transposed
    layout (planes qs_t/d_t[/m_t/kd_t/km_t]; drops qs/d_p — the small f16
    block planes are kept for dequantize/export). Bit-identical
    values/scales; jit-friendly (pure layout transforms)."""
    from ..dtypes import GType

    n, k = qt.shape
    tile, nc, kp = swar_layout(n, k, kt_bytes=swar_kt_bytes(qt.gtype),
                gtype=qt.gtype)
    block = 16 if qt.gtype == GType.Q6_K else 32

    def padk(a):  # zero blocks: values 0, and (below) scale d = 0
        return a if kp == k else jnp.pad(a, ((0, 0), (0, kp - k)))

    if qt.gtype == GType.Q8_0:
        vals = from_storage_order(qt.planes["qs"], 32).astype(jnp.int32)
        planes = {"qs_t": swar_pack_values_q8(padk(vals), nc)}
        scale_keys = ("d",)
    elif qt.gtype in (GType.Q5_0, GType.Q5_1):
        from .quantize import _unpack_high_bits

        lo = from_storage_order(unpack_nibbles(qt.planes["qs"], k), 32)
        hb = _unpack_high_bits(qt.planes["qh"]).reshape(n, k)
        planes = {
            "qs_t": swar_pack_values(padk(lo), nc),
            "qh_t": swar_pack_qh1(padk(hb), nc),
        }
        scale_keys = ("d",) if qt.gtype == GType.Q5_0 else ("d", "m")
    elif qt.gtype == GType.Q6_K:
        flat = unpack_nibbles(qt.planes["ql"], k) \
            | (unpack_2bit(qt.planes["qh"], k) << 4)
        vals = from_storage_order(flat, 16)  # biased [0, 63]
        planes = {
            "qs_t": swar_pack_values(padk(vals & 0xF), nc, block=16),
            "qh_t": swar_pack_qh2(padk(vals >> 4), nc, block=16),
        }
        scale_keys = ("kd",)
    else:
        vals = unpack_nibbles(qt.planes["qs"], k)  # storage order
        vals = from_storage_order(vals, 32)
        planes = {"qs_t": swar_pack_values(padk(vals), nc)}
        if qt.gtype == GType.Q4_0:
            scale_keys = ("d",)
        elif qt.gtype == GType.Q4_1:
            scale_keys = ("d", "m")
        elif qt.gtype == GType.Q4_K:
            scale_keys = ("kd", "km")
        else:
            raise ValueError(f"swar: unsupported {qt.gtype}")
    cpad = (kp - k) // block
    for key in scale_keys:
        sc = qt.planes[key]
        if cpad:
            sc = jnp.pad(sc, ((0, 0), (0, cpad)))  # d/m = 0 on pad blocks
        planes[_SWAR_SCALE_KEYS[key]] = swar_pack_scales(sc, nc)
        planes[key] = qt.planes[key]
    return QTensor(qt.gtype, qt.shape, planes)


def swar_supported(qt: "QTensor") -> bool:
    from ..dtypes import GType

    if qt.gtype not in (GType.Q4_0, GType.Q4_1, GType.Q4_K, GType.Q8_0,
                        GType.Q5_0, GType.Q5_1, GType.Q6_K):
        return False
    if len(qt.shape) != 2:
        return False
    n, k = qt.shape
    if k % 64:
        return False
    keys = {
        GType.Q4_0: ("qs", "d"), GType.Q8_0: ("qs", "d"),
        GType.Q4_1: ("qs", "d", "m"), GType.Q4_K: ("qs", "kd", "km"),
        GType.Q5_0: ("qs", "qh", "d"), GType.Q5_1: ("qs", "qh", "d", "m"),
        GType.Q6_K: ("ql", "qh", "kd"),
    }[qt.gtype]
    if any(key not in qt.planes for key in keys):
        return False
    try:
        swar_layout(n, k, kt_bytes=swar_kt_bytes(qt.gtype),
                    gtype=qt.gtype)
    except ValueError:
        return False
    return True


def check_last_axis(x: jnp.ndarray, gtype: GType):
    bs = block_size(gtype)
    if x.shape[-1] % bs != 0:
        raise ValueError(
            f"last axis {x.shape[-1]} not a multiple of {TYPE_TRAITS[gtype].name} "
            f"block size {bs}"
        )
