"""Fused dequant-matmul Pallas kernels — the quantized-inference hot loop.

TPU-native replacement for the reference's mul_mat_q_f32 row loop +
vec_dot_q (Ggml.cs:6440-6712, 1125-1381): packed integer planes stay in HBM,
each grid step DMAs one (TILE_N, K)-worth of packed blocks into VMEM, unpacks
with lane-wise shifts, applies per-block scales, and feeds the MXU directly.
No dequantized copy of the weights ever exists in HBM, so decode stays at the
packed-bytes bandwidth roofline.

Layout contract (quant.formats): integer planes are stored in block-
transposed STORAGE ORDER, so inside the kernel
  * nibble/2-bit unpack is shift+mask+concat along lanes (no shape casts
    Mosaic rejects),
  * per-block scale expansion is a lane TILE (pltpu.repeat),
  * Q5 high-bit masks expand with 32 shift+concat ops.
The activation tile is permuted to the same storage order OUTSIDE the kernel
(one cheap XLA gather, fused into the activations' producer); a dot product
is permutation-invariant, so results are unchanged.

Numerics: blocks are dequantized to f32 inside VMEM (int values and f16
scales are exact in f32) and the dot accumulates in f32 — bit-comparable to
the jnp reference path modulo summation order. Activation quantization
(ggml's INIT-phase trick, Ggml.cs:6641-6655) is applied outside by round-
tripping activations through the companion Q8 format — mathematically
identical to the integer-dot formulation (see ops.matmul docstring).

Grid: 1-D over output tiles (TILE_N weight rows); the full K of one tile is
unpacked at once (f32 scratch ≤ ~5.6 MB at K=11008). Larger K falls back.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import GType
from ..quant.formats import QTensor, to_storage_order
from .config import interpret_mode, mm_dot_mode

TILE_N = int(__import__("os").environ.get("GGML_TPU_TILE_N", "256"))


def _int_dot_enabled() -> bool:
    # default OFF: this libtpu's Mosaic rejects the (1,C)→(TN,C) int32
    # sublane broadcast the kernel needs ("Invalid input layout"); the bf16
    # fused path measures identically (69.3 tok/s, 7B Q4_0) and stays the
    # default. Enable on toolchains whose Mosaic supports it (or interpret
    # mode) for bit-exact ggml integer dots.
    return __import__("os").environ.get("GGML_TPU_INT_DOT", "0") == "1"
MAX_K_F32 = 16384  # unpacked f32 tile must fit VMEM
# activation block cap per grid step (VMEM is ~16 MB/core and must also hold
# the weight tile + intermediates; prefill feeds b = B·S rows)
_MAX_XB_BYTES = 4 * 1024 * 1024


def _tile(x, n):
    """Per-block scales [TN, C] → per-element [TN, n*C] in STORAGE order
    (lane-axis tile: position t*C+c ← x[:, c])."""
    return pltpu.repeat(x, n, axis=1)


def _unpack4(qs_u32):
    parts = [
        ((qs_u32 >> jnp.uint32(4 * j)) & jnp.uint32(0xF)).astype(jnp.int32)
        for j in range(8)
    ]
    return jnp.concatenate(parts, axis=1)


def _unpack2(qh_u32):
    parts = [
        ((qh_u32 >> jnp.uint32(2 * j)) & jnp.uint32(0x3)).astype(jnp.int32)
        for j in range(16)
    ]
    return jnp.concatenate(parts, axis=1)


def _unpack_hb(qh_u32):
    """Per-block 32-bit masks [TN, C] → 0/1 ints [TN, 32C] in storage order
    (bit l of block c lands at position l*C+c)."""
    parts = [
        ((qh_u32 >> jnp.uint32(l)) & jnp.uint32(1)).astype(jnp.int32)
        for l in range(32)
    ]
    return jnp.concatenate(parts, axis=1)


def _decode_f16x2(ref):
    """uint32 f16-pair scale plane [TN, C/2] → f32 [TN, C] (block order).

    Mosaic (this libtpu) has no f16 vector type, so scale planes arrive as
    packed uint32 pairs (formats.pack_f16_pairs) and are decoded with integer
    lane math + one bitcast: rebias the exponent 15→127 and shift the
    mantissa into f32 position; subnormal f16s (exp==0) are man·2⁻²⁴.
    """
    p = ref[:]
    u = jnp.concatenate(
        [p & jnp.uint32(0xFFFF), p >> jnp.uint32(16)], axis=1
    )
    sign_bits = (u & jnp.uint32(0x8000)) << jnp.uint32(16)
    exp = (u >> jnp.uint32(10)) & jnp.uint32(0x1F)
    # Mosaic has no uint32→f32 cast; hop through int32 (values ≤ 0x3FF)
    man = (u & jnp.uint32(0x3FF)).astype(jnp.int32).astype(jnp.float32)
    normal_bits = sign_bits | (
        ((u & jnp.uint32(0x7FFF)) << jnp.uint32(13)) + jnp.uint32(112 << 23)
    )
    normal = pltpu.bitcast(normal_bits, jnp.float32)
    sgn = jnp.where((u & jnp.uint32(0x8000)) > 0, -1.0, 1.0)
    sub = sgn * man * jnp.float32(2.0 ** -24)
    return jnp.where(exp == 0, sub, normal)


# --- per-format tile dequantizers: refs → f32 (TILE_N, K) storage order ---

def _dq_q8_0(dt, qs, d):
    return qs[:].astype(dt) * _tile(_decode_f16x2(d).astype(dt), 32)


def _dq_q4_0(dt, qs, d):
    return (_unpack4(qs[:]) - 8).astype(dt) * _tile(_decode_f16x2(d).astype(dt), 32)


def _dq_q4_1(dt, qs, d, m):
    v = _unpack4(qs[:]).astype(dt)
    return v * _tile(_decode_f16x2(d).astype(dt), 32) + _tile(_decode_f16x2(m).astype(dt), 32)


def _dq_q4_2(dt, qs, d):
    return (_unpack4(qs[:]) - 8).astype(dt) * _tile(_decode_f16x2(d).astype(dt), 16)


def _dq_q4_3(dt, qs, d, m):
    v = _unpack4(qs[:]).astype(dt)
    return v * _tile(_decode_f16x2(d).astype(dt), 16) + _tile(_decode_f16x2(m).astype(dt), 16)


def _dq_q5_0(dt, qs, qh, d):
    v = (_unpack4(qs[:]) | (_unpack_hb(qh[:]) << 4)) - 16
    return v.astype(dt) * _tile(_decode_f16x2(d).astype(dt), 32)


def _dq_q5_1(dt, qs, qh, d, m):
    v = _unpack4(qs[:]) | (_unpack_hb(qh[:]) << 4)
    return v.astype(dt) * _tile(_decode_f16x2(d).astype(dt), 32) + _tile(_decode_f16x2(m).astype(dt), 32)


def _dq_q4_k(dt, qs, kd, km):
    v = _unpack4(qs[:]).astype(dt)
    return v * _tile(_decode_f16x2(kd).astype(dt), 32) - _tile(_decode_f16x2(km).astype(dt), 32)


def _dq_q6_k(dt, ql, qh, kd):
    v = (_unpack4(ql[:]) | (_unpack2(qh[:]) << 4)) - 32
    return v.astype(dt) * _tile(_decode_f16x2(kd).astype(dt), 16)


# gtype → (dequant fn, plane names, storage-order block granularity)
_DEQUANT_TILE = {
    GType.Q8_0: (_dq_q8_0, ("qs", "d_p"), 32),
    GType.Q4_0: (_dq_q4_0, ("qs", "d_p"), 32),
    GType.Q4_1: (_dq_q4_1, ("qs", "d_p", "m_p"), 32),
    GType.Q4_2: (_dq_q4_2, ("qs", "d_p"), 16),
    GType.Q4_3: (_dq_q4_3, ("qs", "d_p", "m_p"), 16),
    GType.Q5_0: (_dq_q5_0, ("qs", "qh", "d_p"), 32),
    GType.Q5_1: (_dq_q5_1, ("qs", "qh", "d_p", "m_p"), 32),
    GType.Q4_K: (_dq_q4_k, ("qs", "kd_p", "km_p"), 32),
    GType.Q6_K: (_dq_q6_k, ("ql", "qh", "kd_p"), 16),
}


# 4-bit formats whose qs plane admits the plane-wise kernel (8 accumulated
# per-plane dots, no full-width concat/scale materialization)
_PLANEWISE = {
    GType.Q4_0: ("d_p", None),
    GType.Q4_1: ("d_p", "m_p"),
    GType.Q4_K: ("kd_p", "km_p"),
}


def _pw_v2_enabled() -> bool:
    # v2 folds the affine term (−8·d for Q4_0, ±m for Q4_1/Q4_K) out of the
    # per-element VPU work into ONE extra MXU dot against the per-position
    # activation sums: y = Σ_j xⱼ·(vⱼ∘d4) + (Σ_j xⱼ)·c4. Saves ~1 VPU op per
    # weight element in a VPU-bound kernel. Identical math, different
    # summation order. bf16 mode only: the separated large terms partially
    # cancel, amplifying bf16 product rounding ~4x (still ~4x below the
    # format's own quantization noise); the f32/HIGHEST parity mode keeps
    # the v1 per-element form.
    return (__import__("os").environ.get("GGML_TPU_PW_V2", "1") != "0"
            and mm_dot_mode() == "bf16")


@functools.partial(
    jax.jit, static_argnames=("gtype", "n", "k", "mode", "v2")
)
def _call_kernel_planes(x_storage, planes, gtype, n, k, mode, v2=True):
    """Plane-wise 4-bit dequant-matmul: nibble plane j covers storage
    positions [j·K/8, (j+1)·K/8) and every plane shares the same per-position
    scale vector tile(d, 4) — so the kernel accumulates 8 narrow dots and
    never materializes the (TN, K) dequantized tile or a K-wide scale copy
    (~25% fewer VPU ops than the concat path, and 8× less VMEM scratch)."""
    d_key, m_key = _PLANEWISE[gtype]
    b = x_storage.shape[0]
    W = k // 8
    dt = jnp.bfloat16 if mode == "bf16" else jnp.float32
    precision = (jax.lax.Precision.DEFAULT if mode == "bf16"
                 else jax.lax.Precision.HIGHEST)
    offset = 8.0 if gtype == GType.Q4_0 else 0.0

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    # batch tiling: the activation block must fit VMEM alongside the weight
    # tile (prefill feeds b = B·S rows; (512, 11008) f32 alone is 22.5 MB).
    # 2-D grid with b INNER: each weight tile is DMA'd once and reused for
    # every b-tile; only the (small) x tiles re-stream.
    cap = max(8, _MAX_XB_BYTES // (k * 4))
    tile_b = b
    while tile_b > cap and tile_b % 2 == 0:
        tile_b //= 2

    def kernel(x_ref, *refs):
        if m_key is not None:
            qs_ref, dp_ref, mp_ref, o_ref = refs
        else:
            qs_ref, dp_ref, o_ref = refs
            mp_ref = None
        bb = x_ref.shape[0]  # = tile_b
        d4f0 = _tile(_decode_f16x2(dp_ref), 4)  # (TN, W) f32
        m4f0 = None if mp_ref is None else _tile(_decode_f16x2(mp_ref), 4)
        q_all = qs_ref[:]

        if v2:
            # affine term via MXU: c4 = −8·d4 (Q4_0) / +m4 (Q4_1) / −m4
            # (Q4_K), dotted once against xs = Σ_j xⱼ. The per-element inner
            # loop is then shift+mask+cast+mul only — all in f32 lanes:
            # measured 34% faster than bf16 lane math on this VPU
            # (scripts/probe_dq_variants.py variant c vs a); the DEFAULT-
            # precision dot converts f32 operands on MXU entry anyway.
            xf = x_ref[:].astype(jnp.float32)
            d4f = d4f0
            xs = xf[:, 0:W]
            for j in range(1, 8):
                xs = xs + xf[:, j * W : (j + 1) * W]
            if gtype == GType.Q4_0:
                c4 = d4f * jnp.float32(-offset)
            elif gtype == GType.Q4_K:
                c4 = -m4f0
            else:
                c4 = m4f0

            def dotf(a, w):
                return jax.lax.dot_general(
                    a, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)

            acc = dotf(xs, c4)
            for j in range(8):
                if j == 0:
                    vj = (q_all & jnp.uint32(0xF)).astype(jnp.int32)
                elif j == 7:
                    vj = (q_all >> jnp.uint32(28)).astype(jnp.int32)
                else:
                    vj = ((q_all >> jnp.uint32(4 * j))
                          & jnp.uint32(0xF)).astype(jnp.int32)
                wj = vj.astype(jnp.float32) * d4f
                acc = acc + dotf(xf[:, j * W : (j + 1) * W], wj)
            o_ref[:] = acc
            return

        d4 = d4f0.astype(dt)
        m4 = None if m4f0 is None else m4f0.astype(dt)
        x = x_ref[:].astype(dt)
        acc = jnp.zeros((bb, TILE_N), jnp.float32)
        for j in range(8):
            vj = ((q_all >> jnp.uint32(4 * j)) & jnp.uint32(0xF)
                  ).astype(jnp.int32).astype(dt)
            if offset:
                vj = vj - dt(offset)
            wj = vj * d4 if m4 is None else vj * d4 - m4 if gtype == GType.Q4_K else vj * d4 + m4
            xj = x[:, j * W : (j + 1) * W]
            acc = acc + dot(xj, wj)
        o_ref[:] = acc

    grid = (n // TILE_N, b // tile_b)  # b INNER: weight tile DMA'd once
    in_specs = [
        pl.BlockSpec((tile_b, k), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_N, W), lambda i, j: (i, 0),  # qs: K/8 u32 words
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_N, k // 64), lambda i, j: (i, 0),  # f16 pairs
                     memory_space=pltpu.VMEM),
    ]
    args = [x_storage, planes["qs"], planes[d_key]]
    if m_key is not None:
        in_specs.append(
            pl.BlockSpec((TILE_N, k // 64), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(planes[m_key])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_b, TILE_N), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),  # disjoint tiles
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k,
            bytes_accessed=planes["qs"].size * 4 + b * k * 4 + b * n * 4,
            transcendentals=0,
        ),
    )(*args)


def _planewise_enabled() -> bool:
    return __import__("os").environ.get("GGML_TPU_PLANEWISE", "1") != "0"


# --- SWAR transposed-layout kernels (quant.formats module comment) --------
#
# Unpack cost ~2.6 VPU ops/element vs ~3.75 for the planewise loop: two
# dense SWAR masks + a 32→8 sublane bitcast replace the 8-iteration
# shift/mask plane loop, then one int8→f32 cast + scale mul per element.
# Measured 617-660 GB/s effective wire bandwidth on v5e (86-92% of the
# 719 GB/s pure-DMA ceiling) vs 530-550 for planewise v2
# (scripts/probe_swar.py). Weight rows ride the LANE axis; the dot
# contracts sublanes — the standard (b,K)·(K,N) orientation.


def _decode_f16x2_rows(ref):
    """Sublane-axis analog of _decode_f16x2: uint32 f16-pair plane
    (C/2, TILE) → f32 (C, TILE), row c ← block c (lo halves first)."""
    return _decode_f16x2_arr(ref[:])


def _decode_f16x2_arr(p):
    u = jnp.concatenate(
        [p & jnp.uint32(0xFFFF), p >> jnp.uint32(16)], axis=0
    )
    sign_bits = (u & jnp.uint32(0x8000)) << jnp.uint32(16)
    exp = (u >> jnp.uint32(10)) & jnp.uint32(0x1F)
    man = (u & jnp.uint32(0x3FF)).astype(jnp.int32).astype(jnp.float32)
    normal_bits = sign_bits | (
        ((u & jnp.uint32(0x7FFF)) << jnp.uint32(13)) + jnp.uint32(112 << 23)
    )
    normal = pltpu.bitcast(normal_bits, jnp.float32)
    sgn = jnp.where((u & jnp.uint32(0x8000)) > 0, -1.0, 1.0)
    sub = sgn * man * jnp.float32(2.0 ** -24)
    return jnp.where(exp == 0, sub, normal)


def _swar_hostchunk() -> bool:
    # one pallas call PER k-chunk (chunk-offset BlockSpecs over the full
    # planes — no slicing copies), outputs summed in XLA. Workaround for
    # the real-Mosaic multi-chunk corruption (scripts/diag_chunked*.py):
    # single-chunk kernels are the only shape observed solid on hardware.
    return __import__("os").environ.get("GGML_TPU_SWAR_HOSTCHUNK", "0") == "1"


@functools.partial(
    jax.jit,
    static_argnames=("gtype", "n", "k", "tile", "nc", "tile_b",
                     "host_chunks", "mode"),
)
def _call_kernel_swar(xlo, xhi, xs, planes, gtype, n, k, tile, nc, tile_b,
                      host_chunks=False, mode="bf16"):
    """xlo/xhi: (b, K/2) f32 in swar k-order (swar_permute_x); xs: (b, C)
    per-quant-block activation sums in block order.

    Grid is (N-tiles, b-tiles): every grid step owns a disjoint output
    block, written exactly once; the k-chunk loop runs INSIDE the kernel
    over static ref slices. Chunking exists only to bound the f32 unpack
    intermediates to kt_bytes·kc·tile (swar_layout); the packed planes sit
    whole in VMEM (6-16x smaller than their f32 expansion; swar_layout
    budgets their double-buffering). NOTE the round-3 post-mortem: the
    multi-session "chunked-K corruption" hunt (scripts/diag_chunked*.py)
    ended with diag11 proving the kernel outputs match a host bf16-rounding
    simulation elementwise (error-pattern correlation 1.0000) — the
    "failures" were DEFAULT-precision bf16 input rounding (sigma ~
    2^-8·|x·w|·sqrt(K)) tripping fixed test tolerances at K=11008 on
    unit-scale data, never a miscompile. mode="f32" runs the dots at
    Precision.HIGHEST for hardware-exact parity checks.

    Affine fold: the per-element value offsets (−8 Q4_0, −16 Q5_0, −32
    Q6_K) and min planes (±m for Q4_1/Q5_1/Q4_K) never touch the VPU's
    per-element path — Σₖ x·off·d_blk(k) = Σ_c (Σ_{k∈c} x)·off·d_c is ONE
    tiny MXU dot of xs against per-block coefficients (the planewise-v2
    trick, generalized). Removes ~1 VPU op/element plus the m16 sublane
    repeat in a VPU-bound kernel; identical math, different summation
    order (same rounding class as the DEFAULT bf16 dot itself)."""
    precision = (jax.lax.Precision.DEFAULT if mode == "bf16"
                 else jax.lax.Precision.HIGHEST)
    b = xlo.shape[0]
    kc = k // nc
    is_q6 = gtype == GType.Q6_K
    is_q5 = gtype in (GType.Q5_0, GType.Q5_1)
    bs = 16 if is_q6 else 32
    cc = kc // bs        # scale blocks per chunk
    rep = kc // 2 // cc  # sublane scale expansion (8 for Q6_K, else 16)
    has_m = gtype in (GType.Q4_1, GType.Q4_K, GType.Q5_1)
    msign = -1.0 if gtype == GType.Q4_K else 1.0
    voff = {GType.Q4_0: -8.0, GType.Q5_0: -16.0, GType.Q6_K: -32.0}.get(
        gtype, 0.0)
    qh_rows = (kc // 16 if is_q6 else kc // 32) if (is_q6 or is_q5) else 0
    d_key = "kd_t" if gtype in (GType.Q4_K, GType.Q6_K) else "d_t"

    def build(body_nc: int, t0: int):
        """One pallas call over chunks [t0, t0 + body_nc) of the planes.
        BlockSpec blocks are body_nc chunks wide; t0 is the block index, so
        per-chunk calls read the shared WEIGHT planes in place (sublane-dim
        chunking, no copies). The x-side operands are host-sliced to the
        chunk instead of block-indexed: a (tile_b, cc) lane-dim block over
        the full (b, nc*cc) xs is rejected by real Mosaic whenever
        cc < 128 (7B kc=512 → cc=16) — a full-minor-dim block over the
        pre-sliced chunk is always legal."""
        host_slice = body_nc < nc
        if host_slice:
            xlo_a = xlo[:, t0 * (kc // 2) : (t0 + body_nc) * (kc // 2)]
            xhi_a = xhi[:, t0 * (kc // 2) : (t0 + body_nc) * (kc // 2)]
            xs_a = xs[:, t0 * cc : (t0 + body_nc) * cc]
            xcol = 0
        else:
            xlo_a, xhi_a, xs_a = xlo, xhi, xs
            xcol = t0

        def kernel(xlo_ref, xhi_ref, xs_ref, *refs):
            rest = list(refs)
            qs_ref = rest.pop(0)
            qh_ref = rest.pop(0) if (is_q6 or is_q5) else None
            d_ref = rest.pop(0)
            m_ref = rest.pop(0) if has_m else None
            (o_ref,) = rest

            def dot(a, w):
                return jax.lax.dot_general(
                    a, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)

            acc = None
            mask = jnp.uint32(0x0F0F0F0F)
            for t in range(body_nc):  # static: per-chunk f32 intermediates
                p = qs_ref[t * (kc // 8) : (t + 1) * (kc // 8), :]
                vlo = pltpu.bitcast(p & mask, jnp.int8)
                vhi = pltpu.bitcast((p >> jnp.uint32(4)) & mask, jnp.int8)
                # chunk-major scale rows; pair packing is per-chunk planar
                d_dec = _decode_f16x2_arr(
                    d_ref[t * (cc // 2) : (t + 1) * (cc // 2), :])
                d16 = pltpu.repeat(d_dec, rep, axis=0)
                if is_q6:
                    # 2-bit high plane. Field s of byte b sits at word bits
                    # 8b+2s (formats.swar_pack_qh2); the net shift (4-2s)
                    # re-positions it at bits 4-5 of its byte IN the uint32
                    # domain, so the merge with the lo nibbles is one int8
                    # OR — no f32 cast/scale/add per element (the r5 unpack
                    # redesign: was cast+*16.0+add, ~3 extra f32 VPU
                    # ops/elt in a VPU-bound kernel).
                    q = qh_ref[t * qh_rows : (t + 1) * qh_rows, :]
                    m2 = jnp.uint32(0x30303030)
                    hcat = jnp.concatenate(
                        [pltpu.bitcast(
                            ((q << jnp.uint32(4 - 2 * s)) if s < 2
                             else (q >> jnp.uint32(2 * s - 4))) & m2,
                            jnp.int8)
                         for s in range(4)], axis=0)  # (kc, tile), 16·h
                    vlo = vlo | hcat[: kc // 2]
                    vhi = vhi | hcat[kc // 2 :]
                elif is_q5:
                    # 1-bit high plane: same trick, net shift (4-s) puts
                    # bit s at byte bit 4 (formats.swar_pack_qh1 contract).
                    q = qh_ref[t * qh_rows : (t + 1) * qh_rows, :]
                    m1 = jnp.uint32(0x10101010)
                    hcat = jnp.concatenate(
                        [pltpu.bitcast(
                            ((q << jnp.uint32(4 - s)) if s < 4
                             else (q >> jnp.uint32(s - 4))) & m1,
                            jnp.int8)
                         for s in range(8)], axis=0)  # (kc, tile), 16·h
                    vlo = vlo | hcat[: kc // 2]
                    vhi = vhi | hcat[kc // 2 :]
                wlo = vlo.astype(jnp.float32) * d16
                whi = vhi.astype(jnp.float32) * d16
                # per-block affine coefficients (cc, tile): off·d and/or ±m
                caff = d_dec * jnp.float32(voff) if voff else None
                if m_ref is not None:
                    m_dec = _decode_f16x2_arr(
                        m_ref[t * (cc // 2) : (t + 1) * (cc // 2), :])
                    maff = jnp.float32(msign) * m_dec
                    caff = maff if caff is None else caff + maff
                part = (dot(xlo_ref[:, t * (kc // 2) : (t + 1) * (kc // 2)],
                            wlo)
                        + dot(xhi_ref[:, t * (kc // 2) : (t + 1) * (kc // 2)],
                              whi))
                if caff is not None:
                    part = part + dot(xs_ref[:, t * cc : (t + 1) * cc], caff)
                acc = part if acc is None else acc + part
            o_ref[:] = acc

        grid = (n // tile, b // tile_b)
        in_specs = [
            pl.BlockSpec((tile_b, body_nc * kc // 2),
                         lambda i, jb: (jb, xcol), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, body_nc * kc // 2),
                         lambda i, jb: (jb, xcol), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, body_nc * cc),
                         lambda i, jb: (jb, xcol), memory_space=pltpu.VMEM),
            pl.BlockSpec((body_nc * kc // 8, tile),
                         lambda i, jb: (t0, i), memory_space=pltpu.VMEM),
        ]
        args = [xlo_a, xhi_a, xs_a, planes["qs_t"]]
        if is_q6 or is_q5:
            in_specs.append(
                pl.BlockSpec((body_nc * qh_rows, tile),
                             lambda i, jb: (t0, i), memory_space=pltpu.VMEM)
            )
            args.append(planes["qh_t"])
        in_specs.append(
            pl.BlockSpec((body_nc * cc // 2, tile),
                         lambda i, jb: (t0, i), memory_space=pltpu.VMEM)
        )
        args.append(planes[d_key])
        if has_m:
            in_specs.append(
                pl.BlockSpec((body_nc * cc // 2, tile),
                             lambda i, jb: (t0, i), memory_space=pltpu.VMEM)
            )
            args.append(planes["km_t" if gtype == GType.Q4_K else "m_t"])
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile_b, tile), lambda i, jb: (jb, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            interpret=interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * body_nc * kc,
                bytes_accessed=planes["qs_t"].size * 4 // nc * body_nc
                + b * body_nc * kc * 4 + b * n * 4,
                transcendentals=0,
            ),
        )(*args)

    if host_chunks and nc > 1:
        out = build(1, 0)
        for t in range(1, nc):
            out = out + build(1, t)
        return out
    return build(nc, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n", "k", "tile", "nc", "tile_b", "host_chunks",
                     "mode"),
)
def _call_kernel_swar_q8(x, planes, n, k, tile, nc, tile_b,
                         host_chunks=False, mode="bf16"):
    """Q8_0 variant: one full-width plane, no nibble masks — a single 32→8
    sublane bitcast IS the unpack (~1.3 VPU ops/element). x: (b, K) f32 in
    the q8 swar k-order (swar_permute_x_q8). Same chunk handling and
    precision modes as _call_kernel_swar (in-kernel loop, or one call per
    chunk when host_chunks — see there)."""
    b = x.shape[0]
    kc = k // nc
    cc = kc // 32
    precision = (jax.lax.Precision.DEFAULT if mode == "bf16"
                 else jax.lax.Precision.HIGHEST)

    def build(body_nc: int, t0: int):
        # per-chunk calls host-slice x (full-minor-dim block; see
        # _call_kernel_swar.build for the Mosaic lane rule this avoids)
        host_slice = body_nc < nc
        x_a = (x[:, t0 * kc : (t0 + body_nc) * kc] if host_slice else x)
        xcol = 0 if host_slice else t0

        def kernel(x_ref, qs_ref, d_ref, o_ref):
            acc = None
            for t in range(body_nc):
                v = pltpu.bitcast(
                    qs_ref[t * (kc // 4) : (t + 1) * (kc // 4), :], jnp.int8)
                d16 = pltpu.repeat(_decode_f16x2_arr(
                    d_ref[t * (cc // 2) : (t + 1) * (cc // 2), :]), 32,
                    axis=0)
                w = v.astype(jnp.float32) * d16
                part = jax.lax.dot_general(
                    x_ref[:, t * kc : (t + 1) * kc], w,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                acc = part if acc is None else acc + part
            o_ref[:] = acc

        return pl.pallas_call(
            kernel,
            grid=(n // tile, b // tile_b),
            in_specs=[
                pl.BlockSpec((tile_b, body_nc * kc),
                             lambda i, jb: (jb, xcol),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((body_nc * kc // 4, tile),
                             lambda i, jb: (t0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((body_nc * cc // 2, tile),
                             lambda i, jb: (t0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, tile), lambda i, jb: (jb, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            interpret=interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * body_nc * kc,
                bytes_accessed=planes["qs_t"].size * 4 // nc * body_nc
                + b * body_nc * kc * 4 + b * n * 4,
                transcendentals=0,
            ),
        )(x_a, planes["qs_t"], planes["d_t"])

    if host_chunks and nc > 1:
        out = build(1, 0)
        for t in range(1, nc):
            out = out + build(1, t)
        return out
    return build(nc, 0)


def swar_permute_x_q8(x2, k: int, nc: int):
    """Element-order activations (b, K) → q8 swar k-order: per chunk,
    position i ← element 32·(i mod C) + i//C.

    Vectorized over chunks (ONE reshape/transpose instead of a python loop
    emitting 3 XLA ops per chunk — at nc=22 the per-chunk form added ~66
    host-graph ops to every matmul call, measurable launch glue in the
    decode chain)."""
    b = x2.shape[0]
    kc = k // nc
    cc = kc // 32
    x3 = x2.reshape(b, nc, cc, 32)
    return jnp.transpose(x3, (0, 1, 3, 2)).reshape(b, k)


def swar_permute_x(x2, k: int, nc: int, block: int = 32):
    """Element-order activations (b, K) → (x_lo, x_hi) in the swar k-order:
    per chunk, row i ← element block·(i mod C) + 2·(i//C) (+1 for hi).
    Vectorized over chunks (see swar_permute_x_q8)."""
    b = x2.shape[0]
    kc = k // nc
    cc = kc // block
    x5 = x2.reshape(b, nc, cc, block // 2, 2)
    lo = jnp.transpose(x5[..., 0], (0, 1, 3, 2)).reshape(b, k // 2)
    hi = jnp.transpose(x5[..., 1], (0, 1, 3, 2)).reshape(b, k // 2)
    return lo, hi


def mul_mat_swar(a: QTensor, bx, quantize_acts: bool = True):
    """Fused dequant-matmul over a SWAR-layout QTensor (formats.to_swar)."""
    from ..quant.formats import swar_layout
    from ..quant.quantize import dequantize
    from ..ops.matmul import quantize_activations

    n, k = a.shape
    x = jnp.asarray(bx, jnp.float32)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    if quantize_acts:
        x2 = dequantize(quantize_activations(x2, a.gtype))
    rows = x2.shape[0]
    rpad = (-rows) % 8 if rows > 8 else 0
    if rpad:
        x2 = jnp.pad(x2, ((0, rpad), (0, 0)))
    b = x2.shape[0]
    from ..quant.formats import swar_kt_bytes

    tile, nc, kp = swar_layout(n, k, kt_bytes=swar_kt_bytes(a.gtype),
                               gtype=a.gtype)
    if kp != k:  # layout k-padding: planes hold zero blocks past k
        x2 = jnp.pad(x2, ((0, 0), (0, kp - k)))
    cap = max(8, _MAX_XB_BYTES // (kp * 4))
    tile_b = b
    while tile_b > cap and tile_b % 2 == 0:
        tile_b //= 2
    hc = _swar_hostchunk()
    if a.gtype == GType.Q8_0:
        xq = swar_permute_x_q8(x2, kp, nc)
        out = _call_kernel_swar_q8(xq, dict(a.planes), n, kp, tile, nc,
                                   tile_b, host_chunks=hc,
                                   mode=mm_dot_mode())
    else:
        block = 16 if a.gtype == GType.Q6_K else 32
        xlo, xhi = swar_permute_x(x2, kp, nc, block=block)
        # per-quant-block activation sums for the in-kernel affine fold
        # (offset/min terms ride one small MXU dot instead of per-element
        # VPU work) — natural block order IS chunk-major (chunk t covers
        # blocks [t·cc, (t+1)·cc)), matching the per-chunk scale rows; the
        # full-lane (b, C) block is legal (lanes == array dim)
        xs = x2.reshape(b, kp // block, block).sum(axis=-1)
        out = _call_kernel_swar(xlo, xhi, xs, dict(a.planes), a.gtype, n, kp,
                                tile, nc, tile_b, host_chunks=hc,
                                mode=mm_dot_mode())
    if rpad:
        out = out[:rows]
    return out.reshape(*lead, n)


def fused_supported(qt: QTensor) -> bool:
    if qt.gtype not in _DEQUANT_TILE:
        return False
    if len(qt.shape) != 2:
        return False
    _, keys, _ = _DEQUANT_TILE[qt.gtype]
    if any(key not in qt.planes for key in keys):
        return False  # e.g. odd scale-plane length → no f16-pair plane
    n, k = qt.shape
    return n % TILE_N == 0 and k <= MAX_K_F32


@functools.partial(
    jax.jit, static_argnames=("gtype", "n", "k", "plane_keys", "mode")
)
def _call_kernel(x_storage, planes, gtype, n, k, plane_keys, mode):
    dq, _, _ = _DEQUANT_TILE[gtype]
    b = x_storage.shape[0]
    if mode == "bf16":
        # f32 LANE math feeding a DEFAULT-precision (single bf16 pass) MXU
        # dot: 34% faster than bf16 lane ops on this VPU (probe_dq_variants)
        dt, precision = jnp.float32, jax.lax.Precision.DEFAULT
    else:
        dt, precision = jnp.float32, jax.lax.Precision.HIGHEST

    cap = max(8, _MAX_XB_BYTES // (k * 4))
    tile_b = b
    while tile_b > cap and tile_b % 2 == 0:
        tile_b //= 2

    def kernel(x_ref, *refs):
        *w_refs, o_ref = refs
        w = dq(dt, *w_refs)  # (TILE_N, K) storage order
        # bf16 mode: f32 lanes into a single-pass DEFAULT MXU dot (2^-9
        # product rounding — far below quant noise). f32 mode: HIGHEST
        # multi-pass, bit-comparable to the jnp reference (parity tests).
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(dt), w,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    grid = (n // TILE_N, b // tile_b)  # b INNER: weight tile DMA'd once
    in_specs = [pl.BlockSpec((tile_b, k), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM)]
    plane_vals = []
    for key in plane_keys:
        p = planes[key]
        pk = p.shape[1]
        in_specs.append(
            pl.BlockSpec((TILE_N, pk), lambda i, j, pk=pk: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        plane_vals.append(p)
    out_spec = pl.BlockSpec((tile_b, TILE_N), lambda i, j: (j, i),
                            memory_space=pltpu.VMEM)

    flops = 2 * b * n * k
    bytes_accessed = sum(p.size * p.dtype.itemsize for p in plane_vals) + b * k * 4 + b * n * 4
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
    )(x_storage, *plane_vals)


_INT_DOT_VOFF = {GType.Q4_0: 8.0, GType.Q5_0: 16.0}
_INT_DOT_Q5 = (GType.Q5_0, GType.Q5_1)
_INT_DOT_M = (GType.Q4_1, GType.Q5_1)  # Q8_1 activations + m·s correction


@functools.partial(
    jax.jit, static_argnames=("gtype", "n", "k", "qs_key")
)
def _call_int_dot_kernel(xq, da, xs, planes, gtype, n, k, qs_key):
    """Exact ggml integer-dot decode kernel (batch 1).

    Implements vec_dot_q semantics natively (Ggml.cs:1125-1381):
    int8×int8 MACs accumulated in int32 per 32-block, then Σ_c dw·da·S_c in
    f32 — bit-faithful to llama.cpp's quantized dot up to f32 summation
    order. Works on storage-order chunks: S[n,c] = Σ_t w[n,tC+c]·x[tC+c] is
    32 lane-wise integer FMAs; the Q4_0/Q5_0 value offsets (−8/−16) fold
    into the activation block sums (the reference's Q8_1 `s` trick,
    Ggml.cs:805-821). Q4_1/Q5_1 use Q8_1 activations: the min term rides as
    Σ_c m_c·s_c with s = d8·Σq8 (`xs`, the reference's s0+s1); Q5_x
    reinsert the per-element high bit from the qh mask plane (bit l = elem
    l, so storage chunk t's high bits are (qh >> t) & 1).
    """
    C = k // 32
    voff = _INT_DOT_VOFF.get(gtype, 0.0)
    is_q5 = gtype in _INT_DOT_Q5
    has_m = gtype in _INT_DOT_M
    is_nib = gtype != GType.Q8_0
    # the pre-broadcast x tile (tile, k) int8 dominates VMEM; shrink for
    # long rows (k=11008 at tile 256 is ~770KB over the 16MB budget)
    tile = TILE_N if k <= 8192 else min(TILE_N, 128)

    def kernel(xq_ref, da_ref, *refs):
        # x/da arrive PRE-BROADCAST to (TN, ·): Mosaic rejects the
        # (1,C)→(TN,C) sublane broadcast ("Invalid input layout").
        # Weights unpack CHUNK-WISE: storage chunk t lives in nibble plane
        # t//4, word range [(t%4)·C, (t%4+1)·C) — one shift+mask per chunk,
        # so no (TN, K) int32 intermediate ever materializes (a full unpack
        # blows VMEM at K=11008).
        rest = list(refs)
        xs_ref = rest.pop(0) if has_m else None
        qs_ref = rest.pop(0)
        qh_ref = rest.pop(0) if is_q5 else None
        dp_ref = rest.pop(0)
        mp_ref = rest.pop(0) if has_m else None
        (o_ref,) = rest
        q_all = qs_ref[:]
        qh_all = qh_ref[:] if is_q5 else None
        x_all = xq_ref[:]
        acc = jnp.zeros((tile, C), jnp.int32)
        xsum = jnp.zeros((tile, C), jnp.int32)
        for t in range(32):
            xc = x_all[:, t * C : (t + 1) * C].astype(jnp.int32)
            if is_nib:
                word = q_all[:, (t % 4) * C : (t % 4 + 1) * C]
                wc = ((word >> jnp.uint32(4 * (t // 4)))
                      & jnp.uint32(0xF)).astype(jnp.int32)
                if is_q5:
                    hb = ((qh_all >> jnp.uint32(t))
                          & jnp.uint32(1)).astype(jnp.int32)
                    wc = wc | (hb << 4)
            else:
                wc = q_all[:, t * C : (t + 1) * C].astype(jnp.int32)
            acc = acc + wc * xc
            if voff:
                xsum = xsum + xc
        eff = _decode_f16x2(dp_ref) * da_ref[:]  # (TN,C)*(TN,C) f32
        s = acc.astype(jnp.float32)
        if voff:
            s = s - jnp.float32(voff) * xsum.astype(jnp.float32)
        o = jnp.sum(eff * s, axis=1, keepdims=True)
        if has_m:
            o = o + jnp.sum(_decode_f16x2(mp_ref) * xs_ref[:],
                            axis=1, keepdims=True)
        o_ref[:] = o

    grid = (n // tile,)
    qs = planes[qs_key]
    xq = jnp.broadcast_to(xq, (tile, k))
    da = jnp.broadcast_to(da, (tile, C))
    in_specs = [
        pl.BlockSpec((tile, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xq, da]
    if has_m:  # Q8_1 activation block sums s = d8·Σq8 (pre-broadcast)
        in_specs.append(pl.BlockSpec((tile, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.broadcast_to(xs, (tile, C)))
    in_specs.append(pl.BlockSpec((tile, qs.shape[1]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    args.append(qs)
    if is_q5:
        in_specs.append(pl.BlockSpec((tile, C), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(planes["qh"])
    in_specs.append(pl.BlockSpec((tile, C // 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    args.append(planes["d_p"])
    if has_m:
        in_specs.append(pl.BlockSpec((tile, C // 2), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(planes["m_p"])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k,
            bytes_accessed=qs.size * qs.dtype.itemsize + k + n * 4,
            transcendentals=0,
        ),
    )(*args)


def int_dot_supported(a: QTensor, batch: int) -> bool:
    if batch != 1 or a.gtype not in (GType.Q8_0, GType.Q4_0, GType.Q4_1,
                                     GType.Q5_0, GType.Q5_1):
        return False
    n, k = a.shape
    tile = TILE_N if k <= 8192 else min(TILE_N, 128)
    if a.gtype in _INT_DOT_M and "m_p" not in a.planes:
        return False
    return (n % tile == 0 and k % 64 == 0 and "d_p" in a.planes
            and k <= MAX_K_F32)


def mul_mat_q_int_dot(a: QTensor, bx):
    """Exact-ggml quantized matvec: activations quantized to Q8_0 — or
    Q8_1 for the min-bearing formats (Q4_1/Q5_1), whose vec_dot needs the
    block-sum correction s = d8·Σq8 (Ggml.cs:1165-1246) — integer block
    dots in-kernel."""
    from ..quant.quantize import quantize

    n, k = a.shape
    x = jnp.asarray(bx, jnp.float32)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    if a.gtype in _INT_DOT_M:
        aq = quantize(x2, GType.Q8_1)
        xs = aq["s"].astype(jnp.float32)
    else:
        aq = quantize(x2, GType.Q8_0)  # qs already storage-order int8
        xs = None
    da = aq["d"].astype(jnp.float32)
    out = _call_int_dot_kernel(
        aq["qs"], da, xs, dict(a.planes), a.gtype, n, k,
        "qs",
    )
    return out.reshape(n)[None].reshape(*lead, n)


def mul_mat_q_fused(a: QTensor, bx, quantize_acts: bool = True):
    """a: QTensor [n_out, k]; bx: f32 [..., k] → [..., n_out]."""
    from ..quant.quantize import dequantize
    from ..ops.matmul import mul_mat_q, quantize_activations

    if isinstance(a, QTensor) and "qs_t" in a.planes:
        return mul_mat_swar(a, bx, quantize_acts=quantize_acts)
    if not fused_supported(a):
        return mul_mat_q(a, bx, quantize_acts=quantize_acts)

    n, k = a.shape
    x = jnp.asarray(bx, jnp.float32)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    if (quantize_acts and x2.shape[0] == 1
            and int_dot_supported(a, 1) and _int_dot_enabled()):
        return mul_mat_q_int_dot(a, bx)
    if quantize_acts:
        x2 = dequantize(quantize_activations(x2, a.gtype))
    _, keys, bs = _DEQUANT_TILE[a.gtype]
    x2 = to_storage_order(x2, bs)
    # pad rows to a multiple of 8 so the kernels' batch tiling (power-of-2
    # halving under the VMEM cap) always finds a valid tile
    rows = x2.shape[0]
    rpad = (-rows) % 8 if rows > 8 else 0
    if rpad:
        x2 = jnp.pad(x2, ((0, rpad), (0, 0)))
    if (a.gtype in _PLANEWISE and _planewise_enabled()
            and n % TILE_N == 0 and k % 64 == 0
            and all(key in a.planes for key in _PLANEWISE[a.gtype] if key)):
        out = _call_kernel_planes(x2, dict(a.planes), a.gtype, n, k,
                                  mm_dot_mode(), _pw_v2_enabled())
    else:
        out = _call_kernel(x2, dict(a.planes), a.gtype, n, k, keys,
                           mm_dot_mode())
    if rpad:
        out = out[:rows]
    return out.reshape(*lead, n)
