"""quantize_row / dequantize_row for every block format — pure jnp, vmappable.

Semantics follow upstream ggml (and the reference port where it is faithful;
the port's q8 bugs — unsigned lanes and skipped odd lanes, Ggml.cs:756-760,
805-818 — are deliberately NOT replicated, per SURVEY §2.3):

  * Q4_0  (Ggml.cs:334-377):  signed-absmax ``d = max/-8``; ``q = min(15,
    floor(x/d + 8.5))``; 32-elem blocks.
  * Q4_1  (Ggml.cs:482-530):  affine min/max, ``d = (max-min)/15``.
  * Q4_2  (Ggml.cs:560-610):  Q4_0 with 16-elem blocks, f16 scale.
  * Q4_3:  Q4_1 with 16-elem blocks (declared in the reference's type tables
    but its quantize_fns row is empty, Ggml.cs:248 — first-class here).
  * Q5_0  (Ggml.cs:612-668):  ``d = max/-16``; 5-bit values, high bit in qh.
  * Q5_1  (Ggml.cs:670-730):  affine, ``d = (max-min)/31``.
  * Q8_0  (Ggml.cs:733-770):  ``d = amax/127``; signed int8 lanes.
  * Q8_1  (Ggml.cs:772-834):  Q8_0 + precomputed ``s = d*sum(q)`` correction
    (the reference keeps per-half s0/s1; a single full-block sum is the
    mathematically identical modern-ggml form and is what our dots consume).
  * Q4_K / Q6_K / Q8_K: llama.cpp k-quant superblocks (256 elems), absent
    from the reference, required by BASELINE config 3. Dequantization matches
    llama.cpp exactly; our quantizer uses per-subblock min/max with 6-bit
    (Q4_K) / int8 (Q6_K) scale quantization (llama.cpp's iterative
    make_qkx2_quants search is an offline-quality refinement, not needed for
    GGUF import where blocks arrive pre-quantized).

Canonical plane layout: integer payloads are stored in STORAGE ORDER
(block-transposed, see formats.to_storage_order) so the fused Pallas kernels
expand scales with lane tiles. K-quants additionally carry fused per-subblock
scale planes (`kd`/`km`, f16 = superblock-scale × integer-subscale) consumed
by the kernels; the exact llama.cpp scale fields are kept alongside for
bit-exact wire round-trips.

Scale storage is float16 (modern ggml/GGUF convention) except Q8_1/Q8_K whose
f32 scales match upstream. All dequantization returns float32.

Rounding conventions (ties): nibble offsets use ``floor(v + off + .5)``
(upstream's ``(int8_t)(x + 8.5f)`` pattern); signed q8 uses round-half-away
(upstream ``roundf``).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..dtypes import GType
from .formats import (
    QTensor,
    check_last_axis,
    from_storage_order,
    pack_2bit,
    pack_f16_pairs,
    pack_nibbles,
    to_storage_order,
    unpack_2bit,
    unpack_nibbles,
)

F32 = jnp.float32


def _round_half_away(v):
    return jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)


def _blocks(x, bs):
    """(..., n) -> (..., nb, bs) float32."""
    *lead, n = x.shape
    return x.astype(F32).reshape(*lead, n // bs, bs)


def _signed_absmax(b):
    """Value with the largest magnitude in each block (sign preserved),
    matching the reference's amax/max scan (Ggml.cs:343-354)."""
    idx = jnp.argmax(jnp.abs(b), axis=-1, keepdims=True)
    return jnp.take_along_axis(b, idx, axis=-1)[..., 0]


def _safe_inv(d):
    return jnp.where(d != 0.0, 1.0 / jnp.where(d != 0.0, d, 1.0), 0.0)


def _pack4(q, bs):
    """(..., nb, bs) int blocks → storage-order planar nibble plane."""
    *lead, nb, _ = q.shape
    return pack_nibbles(to_storage_order(q.reshape(*lead, nb * bs), bs))


def _unpack4(plane, n, bs):
    """storage-order planar nibble plane → (..., n) ints in element order."""
    return from_storage_order(unpack_nibbles(plane, n), bs)


# --- Q4_0 family (signed absmax, offset nibbles) -------------------------

def _quantize_q4_sym(x, bs, denom):
    """Shared Q4_0/Q4_2 math: d = max/-denom, q = min(2*denom-1, floor(v+denom+.5))."""
    b = _blocks(x, bs)
    maxv = _signed_absmax(b)
    d = maxv / -denom
    iq = jnp.floor(b * _safe_inv(d)[..., None] + (denom + 0.5))
    q = jnp.clip(iq, 0, 2 * denom - 1).astype(jnp.int32)
    return q, d.astype(jnp.float16)


def quantize_row_q4_0(x) -> QTensor:
    check_last_axis(x, GType.Q4_0)
    q, d = _quantize_q4_sym(x, 32, 8)
    return QTensor(GType.Q4_0, x.shape, {"qs": _pack4(q, 32), "d": d})


def dequantize_row_q4_0(qt: QTensor):
    n = qt.shape[-1]
    v = _unpack4(qt["qs"], n, 32) - 8
    d = jnp.repeat(qt["d"].astype(F32), 32, axis=-1)
    return (v.astype(F32) * d).reshape(qt.shape)


def quantize_row_q4_2(x) -> QTensor:
    check_last_axis(x, GType.Q4_2)
    q, d = _quantize_q4_sym(x, 16, 8)
    return QTensor(GType.Q4_2, x.shape, {"qs": _pack4(q, 16), "d": d})


def dequantize_row_q4_2(qt: QTensor):
    n = qt.shape[-1]
    v = _unpack4(qt["qs"], n, 16) - 8
    d = jnp.repeat(qt["d"].astype(F32), 16, axis=-1)
    return (v.astype(F32) * d).reshape(qt.shape)


# --- Q4_1 family (affine min/max nibbles) --------------------------------

def _quantize_q4_aff(x, bs):
    b = _blocks(x, bs)
    mn = jnp.min(b, axis=-1)
    mx = jnp.max(b, axis=-1)
    d = (mx - mn) / 15.0
    iq = jnp.floor((b - mn[..., None]) * _safe_inv(d)[..., None] + 0.5)
    q = jnp.clip(iq, 0, 15).astype(jnp.int32)
    return q, d.astype(jnp.float16), mn.astype(jnp.float16)


def quantize_row_q4_1(x) -> QTensor:
    check_last_axis(x, GType.Q4_1)
    q, d, m = _quantize_q4_aff(x, 32)
    return QTensor(GType.Q4_1, x.shape, {"qs": _pack4(q, 32), "d": d, "m": m})


def dequantize_row_q4_1(qt: QTensor):
    n = qt.shape[-1]
    v = _unpack4(qt["qs"], n, 32)
    d = jnp.repeat(qt["d"].astype(F32), 32, axis=-1)
    m = jnp.repeat(qt["m"].astype(F32), 32, axis=-1)
    return (v.astype(F32) * d + m).reshape(qt.shape)


def quantize_row_q4_3(x) -> QTensor:
    check_last_axis(x, GType.Q4_3)
    q, d, m = _quantize_q4_aff(x, 16)
    return QTensor(GType.Q4_3, x.shape, {"qs": _pack4(q, 16), "d": d, "m": m})


def dequantize_row_q4_3(qt: QTensor):
    n = qt.shape[-1]
    v = _unpack4(qt["qs"], n, 16)
    d = jnp.repeat(qt["d"].astype(F32), 16, axis=-1)
    m = jnp.repeat(qt["m"].astype(F32), 16, axis=-1)
    return (v.astype(F32) * d + m).reshape(qt.shape)


# --- Q5 family (5-bit: nibble plane + per-block high-bit mask) -----------

def _pack_high_bits(q5):
    """(..., nb, 32) 5-bit values -> per-block uint32 qh (bit l = high bit of
    element l), matching the reference's qh packing (Ggml.cs:644-651)."""
    hb = ((q5 >> 4) & 1).astype(jnp.uint32)
    acc = hb[..., 0]
    for l in range(1, 32):
        acc = acc | (hb[..., l] << jnp.uint32(l))
    return acc


def _unpack_high_bits(qh):
    """(..., nb) masks → (..., nb, 32) 0/1 ints."""
    bits = [((qh >> jnp.uint32(l)) & jnp.uint32(1)).astype(jnp.int32)
            for l in range(32)]
    return jnp.stack(bits, axis=-1)


def quantize_row_q5_0(x) -> QTensor:
    check_last_axis(x, GType.Q5_0)
    b = _blocks(x, 32)
    maxv = _signed_absmax(b)
    d = maxv / -16.0
    iq = jnp.floor(b * _safe_inv(d)[..., None] + 16.5)
    q = jnp.clip(iq, 0, 31).astype(jnp.int32)
    return QTensor(GType.Q5_0, x.shape, {
        "qs": _pack4(q & 0xF, 32),
        "qh": _pack_high_bits(q),
        "d": d.astype(jnp.float16),
    })


def dequantize_row_q5_0(qt: QTensor):
    n = qt.shape[-1]
    lo = _unpack4(qt["qs"], n, 32).reshape(*qt["qh"].shape, 32)
    v = (lo | (_unpack_high_bits(qt["qh"]) << 4)) - 16
    d = qt["d"].astype(F32)[..., None]
    return (v.astype(F32) * d).reshape(qt.shape)


def quantize_row_q5_1(x) -> QTensor:
    check_last_axis(x, GType.Q5_1)
    b = _blocks(x, 32)
    mn = jnp.min(b, axis=-1)
    mx = jnp.max(b, axis=-1)
    d = (mx - mn) / 31.0
    iq = jnp.floor((b - mn[..., None]) * _safe_inv(d)[..., None] + 0.5)
    q = jnp.clip(iq, 0, 31).astype(jnp.int32)
    return QTensor(GType.Q5_1, x.shape, {
        "qs": _pack4(q & 0xF, 32),
        "qh": _pack_high_bits(q),
        "d": d.astype(jnp.float16),
        "m": mn.astype(jnp.float16),
    })


def dequantize_row_q5_1(qt: QTensor):
    n = qt.shape[-1]
    lo = _unpack4(qt["qs"], n, 32).reshape(*qt["qh"].shape, 32)
    v = lo | (_unpack_high_bits(qt["qh"]) << 4)
    d = qt["d"].astype(F32)[..., None]
    m = qt["m"].astype(F32)[..., None]
    return (v.astype(F32) * d + m).reshape(qt.shape)


# --- Q8 family (signed int8 lanes, storage order) ------------------------

def quantize_row_q8_0(x) -> QTensor:
    check_last_axis(x, GType.Q8_0)
    b = _blocks(x, 32)
    amax = jnp.max(jnp.abs(b), axis=-1)
    d = amax / 127.0
    q = _round_half_away(b * _safe_inv(d)[..., None])
    qs = jnp.clip(q, -128, 127).astype(jnp.int8)
    *lead, nb, _ = qs.shape
    return QTensor(GType.Q8_0, x.shape, {
        "qs": to_storage_order(qs.reshape(*lead, nb * 32), 32),
        "d": d.astype(jnp.float16),
    })


def dequantize_row_q8_0(qt: QTensor):
    n = qt.shape[-1]
    qs = from_storage_order(qt["qs"], 32)
    d = jnp.repeat(qt["d"].astype(F32), 32, axis=-1)
    return (qs.astype(F32) * d).reshape(qt.shape)


def quantize_row_q8_1(x) -> QTensor:
    """Activation-side format: f32 scale + block-sum correction ``s = d*Σq``
    (reference keeps s0/s1 halves, Ggml.cs:805-821; the sum is equivalent)."""
    check_last_axis(x, GType.Q8_1)
    b = _blocks(x, 32)
    amax = jnp.max(jnp.abs(b), axis=-1)
    d = amax / 127.0
    q = jnp.clip(_round_half_away(b * _safe_inv(d)[..., None]), -128, 127)
    s = d * jnp.sum(q, axis=-1)
    qs = q.astype(jnp.int8)
    *lead, nb, _ = qs.shape
    return QTensor(GType.Q8_1, x.shape, {
        "qs": to_storage_order(qs.reshape(*lead, nb * 32), 32),
        "d": d.astype(F32),
        "s": s.astype(F32),
    })


def dequantize_row_q8_1(qt: QTensor):
    """The reference leaves this null ("TODO", Ggml.cs:278-282); implemented
    here as first-class."""
    qs = from_storage_order(qt["qs"], 32)
    d = jnp.repeat(qt["d"].astype(F32), 32, axis=-1)
    return (qs.astype(F32) * d).reshape(qt.shape)


# --- k-quant superblocks (llama.cpp; BASELINE config 3) ------------------

def _kq_fused_scales(d, sc, bs_per_sb):
    """f16 fused per-subblock scale plane for the kernels: d (per-256) ×
    integer subscale. f16 rounding adds ≤2^-11 relative error — far below
    the weight quantization noise; exact fields are kept for wire export."""
    *lead, nsb = d.shape
    dd = jnp.repeat(d.astype(F32), bs_per_sb, axis=-1)
    return (dd * sc.astype(F32)).astype(jnp.float16)


def _qkx2_search(sb, nmax: int, rmin=-1.0, rdelta=0.1, nstep=20):
    """Vectorized make_qkx2_quants-style weighted grid search (llama.cpp's
    k-quant quality path): per 32-elem sub-block, try nstep+1 candidate
    inverse scales, refit (scale, min) by weighted least squares given the
    resulting integer levels, keep the (scale, min) with lowest weighted
    squared error. Weights = rms(x) + |x| (llama.cpp's q4_K weighting).
    Returns (scale ≥ 0-ish, min ≤ 0) per sub-block. ~10-20% lower weight
    reconstruction error than the plain min/max fit (VERDICT r1 item 9)."""
    x = sb
    w = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True)) + jnp.abs(x)
    mn = jnp.minimum(jnp.min(x, axis=-1), 0.0)
    mx = jnp.max(x, axis=-1)
    rng = mx - mn
    safe = rng > 0
    inv0 = jnp.where(safe, nmax / jnp.where(safe, rng, 1.0), 0.0)

    def levels(iscale):
        # nearest_int in llama.cpp rounds half-to-even — jnp.round matches
        return jnp.clip(jnp.round(iscale[..., None] * (x - mn[..., None])),
                        0, nmax)

    def werr(scale, m, l):
        r = x - (scale[..., None] * l + m[..., None])
        return jnp.sum(w * r * r, axis=-1)

    scale0 = jnp.where(safe, rng / nmax, 0.0)
    l0 = levels(inv0)
    best = (scale0, mn, werr(scale0, mn, l0))

    sumw = jnp.sum(w, axis=-1)
    for s in range(nstep + 1):
        isc = jnp.where(
            safe, (rmin + rdelta * s + nmax) / jnp.where(safe, rng, 1.0), 0.0)
        l = levels(isc)
        suml = jnp.sum(w * l, axis=-1)
        suml2 = jnp.sum(w * l * l, axis=-1)
        sumx = jnp.sum(w * x, axis=-1)
        sumxl = jnp.sum(w * x * l, axis=-1)
        det = sumw * suml2 - suml * suml
        ok = det > 0
        sdet = jnp.where(ok, det, 1.0)
        D = jnp.where(ok, (sumw * sumxl - sumx * suml) / sdet, scale0)
        M = jnp.where(ok, (suml2 * sumx - suml * sumxl) / sdet, mn)
        # a positive min is never representable (mins stored as -min ≥ 0):
        # clamp to 0 and refit the scale alone
        pos = M > 0
        s2 = jnp.where(suml2 > 0, suml2, 1.0)
        D = jnp.where(pos & (suml2 > 0), sumxl / s2, D)
        M = jnp.where(pos, 0.0, M)
        e = werr(D, M, l)
        better = ok & (e < best[2])
        best = (jnp.where(better, D, best[0]),
                jnp.where(better, M, best[1]),
                jnp.where(better, e, best[2]))
    return best[0], best[1]


def _qx_search(sb, nmax: int, nsteps: int = 9):
    """Vectorized make_qx_quants-style SIGNED scale search (llama.cpp's
    Q6_K quality path, rmse_type=1): per sub-block, try 2·nsteps+1
    candidate inverse scales −(nmax + 0.1·s)/maxv around the absmax fit,
    refit the scale by weighted least squares scale = Σw·x·l / Σw·l²
    (w = x²), keep the candidate maximizing (Σw·x·l)²/Σw·l². Returns the
    refit scale per sub-block (signed; 0 for all-zero blocks)."""
    x = sb
    amax = jnp.max(jnp.abs(x), axis=-1)
    maxv = _signed_absmax(x)
    safe = amax > 0
    den = jnp.where(safe, maxv, 1.0)
    w = x * x
    best_scale = jnp.zeros_like(amax)
    best_obj = jnp.full_like(amax, -jnp.inf)
    for s in range(-nsteps, nsteps + 1):
        isc = jnp.where(safe, -(nmax + 0.1 * s) / den, 0.0)
        l = jnp.clip(jnp.round(isc[..., None] * x), -nmax, nmax - 1)
        sumlx = jnp.sum(w * x * l, axis=-1)
        suml2 = jnp.sum(w * l * l, axis=-1)
        ok = suml2 > 0
        sl2 = jnp.where(ok, suml2, 1.0)
        obj = jnp.where(ok, sumlx * sumlx / sl2, -jnp.inf)
        better = ok & (obj > best_obj)
        best_scale = jnp.where(better, sumlx / sl2, best_scale)
        best_obj = jnp.where(better, obj, best_obj)
    return jnp.where(safe, best_scale, 0.0)


def quantize_row_q4_k(x, search: bool = False) -> QTensor:
    """Q4_K: 256-elem superblocks, 8 sub-blocks of 32 with 6-bit quantized
    scale/min against per-superblock f16 d/dmin; w = d*sc*q - dmin*m.

    search=True runs the make_qkx2_quants-style weighted scale/min search
    (offline/model-quantization path; default stays the fast min/max fit)."""
    check_last_axis(x, GType.Q4_K)
    b = _blocks(x, 256)
    *lead, nsb, _ = b.shape
    sb = b.reshape(*lead, nsb, 8, 32)
    if search:
        s_best, m_best = _qkx2_search(sb, 15)
        scales = jnp.maximum(s_best, 0.0)
        mins = -m_best  # ≥ 0
    else:
        mn = jnp.minimum(jnp.min(sb, axis=-1), 0.0)  # mins stored as -min ≥ 0
        mx = jnp.max(sb, axis=-1)
        scales = (mx - mn) / 15.0
        mins = -mn
    d = jnp.max(scales, axis=-1) / 63.0
    dmin = jnp.max(mins, axis=-1) / 63.0
    sc = jnp.clip(_round_half_away(scales * _safe_inv(d)[..., None]), 0, 63)
    m = jnp.clip(_round_half_away(mins * _safe_inv(dmin)[..., None]), 0, 63)
    eff_d = d[..., None] * sc
    eff_m = dmin[..., None] * m
    iq = jnp.floor((sb + eff_m[..., None]) * _safe_inv(eff_d)[..., None] + 0.5)
    q = jnp.clip(iq, 0, 15).astype(jnp.int32)
    d16 = d.astype(jnp.float16)
    dmin16 = dmin.astype(jnp.float16)
    sc8 = sc.astype(jnp.uint8).reshape(*lead, nsb * 8)
    m8 = m.astype(jnp.uint8).reshape(*lead, nsb * 8)
    return QTensor(GType.Q4_K, x.shape, {
        "qs": _pack4(q.reshape(*lead, nsb * 8, 32), 32),
        "d": d16, "dmin": dmin16, "sc": sc8, "m": m8,
        "kd": _kq_fused_scales(d16, sc8, 8),
        "km": _kq_fused_scales(dmin16, m8, 8),
    })


def dequantize_row_q4_k(qt: QTensor):
    n = qt.shape[-1]
    nsb = n // 256
    *lead, _ = qt["sc"].shape
    q = _unpack4(qt["qs"], n, 32).reshape(*lead, nsb, 8, 32).astype(F32)
    d = qt["d"].astype(F32)[..., None]
    dmin = qt["dmin"].astype(F32)[..., None]
    sc = qt["sc"].astype(F32).reshape(*lead, nsb, 8)
    m = qt["m"].astype(F32).reshape(*lead, nsb, 8)
    w = (d * sc)[..., None] * q - (dmin * m)[..., None]
    return w.reshape(qt.shape)


def quantize_row_q6_k(x, search: bool = False) -> QTensor:
    """Q6_K: 256-elem superblocks, 16 sub-blocks of 16; signed 6-bit values
    with per-sub-block int8 scale against superblock f16 d; w = d*sc*q.

    search=True runs the make_qx_quants-style weighted scale search
    (llama.cpp quantizes Q6_K through it too — offline path; default stays
    the fast absmax fit)."""
    check_last_axis(x, GType.Q6_K)
    b = _blocks(x, 256)
    *lead, nsb, _ = b.shape
    sb = b.reshape(*lead, nsb, 16, 16)
    if search:
        scales = _qx_search(sb, 32)
    else:
        maxv = _signed_absmax(sb)
        scales = maxv / -32.0
    d = _signed_absmax(scales) / -127.0
    sc = jnp.clip(_round_half_away(scales * _safe_inv(d)[..., None]), -128, 127)
    eff = d[..., None] * sc
    iq = jnp.clip(_round_half_away(sb * _safe_inv(eff)[..., None]), -32, 31)
    q = (iq + 32).astype(jnp.int32)  # biased [0, 63]
    flat = to_storage_order(q.reshape(*lead, nsb * 256), 16)
    d16 = d.astype(jnp.float16)
    sc8 = sc.astype(jnp.int8).reshape(*lead, nsb * 16)
    return QTensor(GType.Q6_K, x.shape, {
        "ql": pack_nibbles(flat & 0xF),
        "qh": pack_2bit(flat >> 4),
        "d": d16,
        "sc": sc8,
        "kd": _kq_fused_scales(d16, sc8, 16),
    })


def dequantize_row_q6_k(qt: QTensor):
    n = qt.shape[-1]
    nsb = n // 256
    *lead, _ = qt["sc"].shape
    flat = unpack_nibbles(qt["ql"], n) | (unpack_2bit(qt["qh"], n) << 4)
    q = from_storage_order(flat, 16) - 32
    q = q.reshape(*lead, nsb, 16, 16).astype(F32)
    d = qt["d"].astype(F32)[..., None]
    sc = qt["sc"].astype(F32).reshape(*lead, nsb, 16)
    return ((d * sc)[..., None] * q).reshape(qt.shape)


def quantize_row_q8_k(x) -> QTensor:
    """Q8_K activation format for k-quant dots: f32 d = amax/127 over 256,
    int8 lanes (element order — activation side only), int16 16-group sums
    (llama.cpp block_q8_K)."""
    check_last_axis(x, GType.Q8_K)
    b = _blocks(x, 256)
    amax = jnp.max(jnp.abs(b), axis=-1)
    d = amax / 127.0
    q = jnp.clip(_round_half_away(b * _safe_inv(d)[..., None]), -128, 127)
    *lead, nsb, _ = q.shape
    bsums = jnp.sum(q.reshape(*lead, nsb, 16, 16), axis=-1).astype(jnp.int16)
    return QTensor(GType.Q8_K, x.shape, {
        "qs": q.astype(jnp.int8).reshape(*lead, nsb * 256),
        "d": d.astype(F32),
        "bsums": bsums.reshape(*lead, nsb * 16),
    })


def dequantize_row_q8_k(qt: QTensor):
    d = jnp.repeat(qt["d"].astype(F32), 256, axis=-1)
    return (qt["qs"].astype(F32) * d).reshape(qt.shape)


# --- dispatch ------------------------------------------------------------

_QUANTIZE = {
    GType.Q4_0: quantize_row_q4_0,
    GType.Q4_1: quantize_row_q4_1,
    GType.Q4_2: quantize_row_q4_2,
    GType.Q4_3: quantize_row_q4_3,
    GType.Q5_0: quantize_row_q5_0,
    GType.Q5_1: quantize_row_q5_1,
    GType.Q8_0: quantize_row_q8_0,
    GType.Q8_1: quantize_row_q8_1,
    GType.Q4_K: quantize_row_q4_k,
    GType.Q6_K: quantize_row_q6_k,
    GType.Q8_K: quantize_row_q8_k,
}

_DEQUANTIZE = {
    GType.Q4_0: dequantize_row_q4_0,
    GType.Q4_1: dequantize_row_q4_1,
    GType.Q4_2: dequantize_row_q4_2,
    GType.Q4_3: dequantize_row_q4_3,
    GType.Q5_0: dequantize_row_q5_0,
    GType.Q5_1: dequantize_row_q5_1,
    GType.Q8_0: dequantize_row_q8_0,
    GType.Q8_1: dequantize_row_q8_1,
    GType.Q4_K: dequantize_row_q4_k,
    GType.Q6_K: dequantize_row_q6_k,
    GType.Q8_K: dequantize_row_q8_k,
}


def _pair_plane_names(planes) -> tuple:
    # k-quants: kernels read only the fused kd/km scales; legacy: d/m
    return ("kd", "km") if "kd" in planes else ("d", "m")


def add_scale_pair_planes(qt: QTensor) -> QTensor:
    """Attach uint32 f16-pair copies of the KERNEL-consumed f16 scale planes
    (``<name>_p``) — Mosaic has no f16 vector type (see
    formats.pack_f16_pairs). Skipped when the plane length is odd."""
    for name in _pair_plane_names(qt.planes):
        v = qt.planes.get(name)
        if (v is not None and v.dtype == jnp.float16
                and v.shape[-1] % 2 == 0 and name + "_p" not in qt.planes):
            qt.planes[name + "_p"] = pack_f16_pairs(v)
    return qt


def quantize(x, gtype: GType, search: bool = False) -> QTensor:
    """ggml_quantize_* analog: quantize along the last axis.

    search=True enables the k-quant quality search (Q4_K qkx2-style
    scale/min grid search, Q6_K make_qx-style signed scale search; ignored
    for formats without a search path) — slower, for offline model
    quantization."""
    gtype = GType(gtype)
    if gtype not in _QUANTIZE:
        raise ValueError(f"{gtype.name} is not a quantized format")
    if search and gtype == GType.Q4_K:
        return add_scale_pair_planes(quantize_row_q4_k(x, search=True))
    if search and gtype == GType.Q6_K:
        return add_scale_pair_planes(quantize_row_q6_k(x, search=True))
    return add_scale_pair_planes(_QUANTIZE[gtype](x))


def dequantize(qt: QTensor):
    """dequantize_row_* analog: back to float32."""
    if "qs_t" in qt.planes:  # SWAR transposed layout (formats.to_swar)
        from .formats import (
            swar_kt_bytes, swar_layout, swar_unpack_values,
            swar_unpack_values_q8,
        )

        n, k = qt.shape
        _, nc, kp = swar_layout(n, k, kt_bytes=swar_kt_bytes(qt.gtype),
                                gtype=qt.gtype)

        def unpad(v):  # drop zero pad blocks (swar_layout k-padding)
            return v if kp == k else v[:, :k]

        if qt.gtype == GType.Q8_0:
            v = unpad(swar_unpack_values_q8(qt.planes["qs_t"], n, kp, nc)
                      ).astype(F32)
            d = jnp.repeat(qt["d"].astype(F32), 32, axis=-1)
            return v * d
        if qt.gtype in (GType.Q5_0, GType.Q5_1):
            from .formats import swar_unpack_qh1

            v = unpad(swar_unpack_values(qt.planes["qs_t"], n, kp, nc)
                      | (swar_unpack_qh1(qt.planes["qh_t"], n, kp, nc) << 4)
                      ).astype(F32)
            d = jnp.repeat(qt["d"].astype(F32), 32, axis=-1)
            if qt.gtype == GType.Q5_0:
                return (v - 16.0) * d
            m = jnp.repeat(qt["m"].astype(F32), 32, axis=-1)
            return v * d + m
        if qt.gtype == GType.Q6_K:
            from .formats import swar_unpack_qh2

            v = unpad(
                swar_unpack_values(qt.planes["qs_t"], n, kp, nc, block=16)
                | (swar_unpack_qh2(qt.planes["qh_t"], n, kp, nc) << 4)
            ).astype(F32)
            d = jnp.repeat(qt["kd"].astype(F32), 16, axis=-1)
            return (v - 32.0) * d
        v = unpad(swar_unpack_values(qt.planes["qs_t"], n, kp, nc)
                  ).astype(F32)
        if qt.gtype == GType.Q4_0:
            d = jnp.repeat(qt["d"].astype(F32), 32, axis=-1)
            return (v - 8.0) * d
        if qt.gtype == GType.Q4_1:
            d = jnp.repeat(qt["d"].astype(F32), 32, axis=-1)
            m = jnp.repeat(qt["m"].astype(F32), 32, axis=-1)
            return v * d + m
        d = jnp.repeat(qt["kd"].astype(F32), 32, axis=-1)
        m = jnp.repeat(qt["km"].astype(F32), 32, axis=-1)
        return v * d - m
    return _DEQUANTIZE[qt.gtype](qt)
