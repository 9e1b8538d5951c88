"""Fused single-token decode attention over a flat KV cache — one pallas
call per layer replacing the XLA einsum+mask+softmax+weighted-sum chain.

This is the decode-side realization of GGML_OP_FLASH_ATTN, which the
reference declares, budgets work for, and never implements
(Ggml.cs:3454-3476 builds the node; Ggml.cs:8724-8731 asserts false in
compute) — redesigned for TPU instead of ported: flat token-major cache
rows, one-hot-matrix head reductions on the MXU, online softmax over
chunks streamed through VMEM.

The llama/GPT decode step spends ~25 us/layer on attention glue: a dozen
small XLA ops over [B, H, T, D] cache slices. This kernel reads the cache in
FLAT layout [B, T, E_kv] (token rows, head-major lanes — exactly what
merge_heads produces, one dynamic row write per step) and computes causal
softmax attention for one query token per slot in a single pass, chunked
over T with the standard online-softmax recurrence so arbitrarily long
prefixes stream through VMEM. Batched slots ride a second grid axis with
per-slot prefix lengths from SMEM (continuous-batching decode).

Per-head math without a head transpose (the kernels/gpt2_layer.py trick):
lane j of the cache belongs to head j // D, so per-head score reduction is
one MXU dot against an iota-built one-hot matrix OH[j, h] = (j//D == h),
and broadcasting per-head weights back to lanes uses its transpose:

    S(Tc, H)  = K_chunk · (OH ∘ q)
    P         = exp(S − m_run)            # online max/denominator per head
    acc(1, E) += Σ_H OH ∘ (Pᵀ · V_chunk)  # both reductions on the MXU

GQA rides the same kernel: the caller pre-splits each slot's query into
n_rep rows (1 kv-aligned sub-query per repeat group, q.reshape(Hkv, n_rep,
D) transposed), the kernel runs the recurrence per row, and the caller
reassembles [Hq, D] — K/V are never repeated (BASELINE's no-repeat rule).

The fresh token's K/V initialize the recurrence (score row npast of the
cache is stale and masked out), so its K/V never round-trip through HBM
before being attended.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import interpret_mode

_NEG = -1e30


def pick_chunk(T: int, cap: int = 512, E: int | None = None,
               itemsize: int = 2, budget: int = 14 * 1024 * 1024) -> int:
    """Largest cache-chunk length ≤ cap that divides T (halving search —
    T is a power-of-two bucket multiple in practice).

    When E is given, the cap is VMEM-aware: a single-trip grid (Tc == T)
    holds k+v whole (2 buffers), while a multi-trip grid double-buffers
    both chunk streams (4 buffers of Tc·E·itemsize) — at E=4096 bf16 and
    T=2048 the naive Tc=512 chunks allocate 16.8 MB of scoped VMEM and the
    compile dies 17 KB over the 16 MB limit (observed on v5e). INT8 caches
    dequantize IN-KERNEL to bf16 (scales fold into scores/weights, r5):
    ~12 B per cache element covers the double-buffered int8 streams plus
    both bf16 cast copies."""
    if E is not None:
        if itemsize == 1:  # INT8: in-kernel bf16 dequant intermediates
            while cap >= 64 and 12 * cap * E > budget:
                cap //= 2
            if 12 * cap * E > budget:
                # floored at cap=64 and still over: fail attributably
                # instead of letting Mosaic die with a raw VMEM error
                raise ValueError(
                    f"flash-decode INT8 chunk floor {cap} still needs "
                    f"~{12 * cap * E} B of VMEM (> {budget} B budget) at "
                    f"E={E}; split KV heads or lower the cache width")
        else:
            if T <= cap and 2 * T * E * itemsize <= budget:
                return T  # single trip: no double-buffering
            while cap >= 128 and 4 * cap * E * itemsize > budget:
                cap //= 2
            if 4 * cap * E * itemsize > budget:
                raise ValueError(
                    f"flash-decode chunk floor {cap} still needs "
                    f"~{4 * cap * E * itemsize} B of VMEM (> {budget} B "
                    f"budget) at E={E}, itemsize={itemsize}")
    Tc = T if T <= cap else cap
    while T % Tc:
        Tc //= 2
    return Tc


def _onehot(E, H, D, shape, head_axis, layout="heads"):
    """Lane -> head map: 'heads' = head-major element order (j//D);
    'attn' = the rope-friendly half-split layout of kernels.llama_layer
    ((j mod E/2) // (D/2))."""
    wire = 1 - head_axis
    j = jax.lax.broadcasted_iota(jnp.int32, shape, wire)
    h = jax.lax.broadcasted_iota(jnp.int32, shape, head_axis)
    if layout == "attn":
        hj = (j % (E // 2)) // (D // 2)
    else:
        hj = j // D
    return (hj == h).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("H", "D", "n_rep", "Tc", "layout", "mode"))
def _call_flash_decode(q, kn, vn, kc, vc, npast, H, D, n_rep, Tc,
                       layout="heads", ks=None, vs=None, mode="bf16"):
    """q: (B, n_rep, E_kv) f32 PRE-SCALED sub-queries; kn/vn: (B, 1, E_kv)
    fresh rows; kc/vc: (B, T, E_kv) flat cache (row npast[b] stale per
    slot); npast: (B,) int32. ks/vs: optional (B, T, H) f32 per-(token,
    head) scales for INT8 caches — expanded to lanes in-kernel with one
    one-hot MXU dot per chunk. Returns (B, n_rep, E_kv).

    All per-slot operands ride a leading slot axis blocked at 1 so the
    LAST TWO block dims equal the array dims — real Mosaic rejects 2-D
    blocks like (1, E) over (B, E) (sublane dim neither a multiple of 8
    nor the full axis); interpret mode never checks this."""
    E = q.shape[-1]
    B, T = kc.shape[0], kc.shape[1]
    nch = T // Tc
    int8 = ks is not None

    def kernel(np_ref, qt_ref, kn_ref, vn_ref, kc_ref, vc_ref,
               *rest):
        if int8:
            ks_ref, vs_ref, o_ref, m_s, l_s, a_s = rest
        else:
            o_ref, m_s, l_s, a_s = rest
            ks_ref = vs_ref = None
        jb = pl.program_id(0)
        jc = pl.program_id(1)
        npast = np_ref[jb]
        OH = _onehot(E, H, D, (E, H), 1, layout)
        OHT = _onehot(E, H, D, (H, E), 0, layout)

        def _prec(a, w):
            # f32 operands: HIGHEST (DEFAULT would round the f32 products
            # to bf16 before summing, and softmax amplifies that 2^-9
            # score noise past what XLA's own decode einsum produces —
            # smoke: 1.67e-3 vs its 1e-3 bar on real v5e). bf16 operands:
            # DEFAULT — a bf16 MXU pass multiplies exactly into the f32
            # accumulator, and Mosaic REJECTS bf16×HIGHEST outright
            # ("Bad lhs type", probed on this libtpu).
            both_f32 = (a.dtype == jnp.float32 and w.dtype == jnp.float32)
            return (jax.lax.Precision.HIGHEST if both_f32
                    else jax.lax.Precision.DEFAULT)

        def dot(a, w):
            return jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(a, w))

        def dot0(a, w):
            # contract axis 0 with axis 0 (a "transposed" matmul without a
            # physical transpose): the P·V reduction over the chunk axis
            return jax.lax.dot_general(
                a, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(a, w))

        # q folded into the one-hot: Wq[j, h] = q[j]·[head(j) == h], built
        # from the SUBLANE-oriented q copy (E, n_rep) — E·H VPU ops per
        # grid step instead of Tc·E for kf ⊙ q (the kernel is VPU-bound:
        # the r3 flat path measured 334 GB/s effective; see diag_serve).
        wqs = [OH * qt_ref[0][:, r : r + 1] for r in range(n_rep)]

        @pl.when(jc == 0)
        def _init():
            knf = kn_ref[0].astype(jnp.float32)
            for r in range(n_rep):
                # fresh token seeds the recurrence: weight exp(0) = 1
                m_s[r : r + 1] = dot(knf, wqs[r])
                l_s[r : r + 1] = jnp.ones((1, H), jnp.float32)
                a_s[r : r + 1] = vn_ref[0].astype(jnp.float32)

        # Fast mode (default): feed cache blocks to the MXU in THEIR dtype
        # (bf16 — or int8 cast to bf16, exact: |q| <= 127 fits bf16's
        # mantissa and the MXU multiplies exactly into the f32
        # accumulator); int8 scales fold into the scores (S ∘ ks) and the
        # softmax weights (P ∘ vs) instead of being broadcast over lanes.
        # The r3/r4 path cast whole Tc×E chunks to f32 and reduced P·V on
        # the VPU (sum over a Tc×E broadcast product — measured VPU-bound
        # at ~334 GB/s); both reductions now ride the MXU. Exact mode
        # (GGML_TPU_MM_DOT=f32, the repo-wide parity convention): f32
        # casts + lane-broadcast dequant, bit-comparable to dequantized
        # attention — P then stays f32 through the dot.
        exact = mode == "f32"
        kf = kc_ref[0]
        vf = vc_ref[0]
        if int8:
            if exact:  # lane-broadcast scale expansion, all-f32
                kf = kf.astype(jnp.float32) * dot(ks_ref[0], OHT)
                vf = vf.astype(jnp.float32) * dot(vs_ref[0], OHT)
            else:
                kf = kf.astype(jnp.bfloat16)
                vf = vf.astype(jnp.bfloat16)
        elif exact:
            kf = kf.astype(jnp.float32)
            vf = vf.astype(jnp.float32)
        idx = jc * Tc + jax.lax.broadcasted_iota(jnp.int32, (Tc, 1), 0)
        live = (idx <= npast) & (idx != npast)  # stale fresh row excluded
        for r in range(n_rep):
            S = dot(kf, wqs[r].astype(kf.dtype))
            if int8 and not exact:  # K dequant folded into the scores
                S = S * ks_ref[0]
            S = jnp.where(live, S, _NEG)
            m_old = m_s[r : r + 1]
            m_new = jnp.maximum(m_old, jnp.max(S, axis=0, keepdims=True))
            corr = jnp.exp(m_old - m_new)
            P = jnp.exp(S - m_new)
            l_s[r : r + 1] = l_s[r : r + 1] * corr + jnp.sum(
                P, axis=0, keepdims=True)
            if int8 and not exact:  # V dequant folded into the weights
                P = P * vs_ref[0]
            # o[e] += Σ_t P[t, head(e)]·V[t, e]  =  (Pᵀ·V)[head(e), e]:
            # one (H, Tc)x(Tc, E) MXU dot + an H×E one-hot row-select —
            # P rides in the cache dtype, the same rounding XLA's own
            # DEFAULT einsum decode applies to the attention weights
            PV = dot0(P.astype(vf.dtype), vf)
            contrib = jnp.sum(OHT * PV, axis=0, keepdims=True)
            a_s[r : r + 1] = a_s[r : r + 1] * dot(corr, OHT) + contrib
            m_s[r : r + 1] = m_new

        @pl.when(jc == nch - 1)
        def _final():
            for r in range(n_rep):
                o_ref[0, r : r + 1] = a_s[r : r + 1] / dot(
                    l_s[r : r + 1], OHT)

    vspec = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        vspec((1, E, n_rep), lambda jb, jc: (jb, 0, 0)),
        vspec((1, 1, E), lambda jb, jc: (jb, 0, 0)),
        vspec((1, 1, E), lambda jb, jc: (jb, 0, 0)),
        vspec((1, Tc, E), lambda jb, jc: (jb, jc, 0)),
        vspec((1, Tc, E), lambda jb, jc: (jb, jc, 0)),
    ]
    args = [npast, jnp.transpose(q.reshape(B, n_rep, E), (0, 2, 1)),
            kn.reshape(B, 1, E), vn.reshape(B, 1, E), kc, vc]
    if int8:
        in_specs += [vspec((1, Tc, H), lambda jb, jc: (jb, jc, 0)),
                     vspec((1, Tc, H), lambda jb, jc: (jb, jc, 0))]
        args += [ks, vs]
    return pl.pallas_call(
        kernel,
        grid=(B, nch),
        in_specs=in_specs,
        out_specs=vspec((1, n_rep, E), lambda jb, jc: (jb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_rep, E), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_rep, H), jnp.float32),
            pltpu.VMEM((n_rep, H), jnp.float32),
            pltpu.VMEM((n_rep, E), jnp.float32),
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n_rep * T * E,
            bytes_accessed=2 * B * T * E * kc.dtype.itemsize,
            transcendentals=B * n_rep * T * H,
        ),
    )(*args)


def flash_decode_flat(q_heads, k_new, v_new, k_cache, v_cache, npast,
                      n_head_kv: int, head_dim: int,
                      k_scale=None, v_scale=None):
    """Decode attention for ONE token per slot over a flat cache.

    q_heads: (B, Hq, D) f32 UNscaled; k_new/v_new: (B, E_kv) element-order
    rows (UNquantized floats even for INT8 caches); k_cache/v_cache:
    (B, T, E_kv) flat prefix slices (bucketed; row `npast[b]` stale);
    npast: int32 (B,); k_scale/v_scale: (B, T, H) f32 for INT8 caches.
    Returns (B, Hq, D) f32."""
    B, Hq, D = q_heads.shape
    n_rep = Hq // n_head_kv
    E = n_head_kv * head_dim
    scale = 1.0 / (D ** 0.5)
    # q head hq = hkv·n_rep + r → sub-query row r aligned to kv lanes
    qr = (q_heads.astype(jnp.float32) * scale).reshape(
        B, n_head_kv, n_rep, D).transpose(0, 2, 1, 3).reshape(
        B * n_rep, E)
    T = k_cache.shape[1]
    Tc = pick_chunk(T, E=E, itemsize=k_cache.dtype.itemsize)
    from .config import mm_dot_mode

    out = _call_flash_decode(
        qr, k_new.astype(jnp.float32), v_new.astype(jnp.float32),
        k_cache, v_cache, jnp.asarray(npast, jnp.int32).reshape(B),
        n_head_kv, head_dim, n_rep, Tc, ks=k_scale, vs=v_scale,
        mode=mm_dot_mode())
    return out.reshape(B, n_rep, n_head_kv, D).transpose(0, 2, 1, 3).reshape(
        B, Hq, D)


def flash_decode_flat_attn(q_att, k_new, v_new, k_cache, v_cache, npast,
                           n_head: int, n_head_kv: int, head_dim: int):
    """Decode attention over an ATTN-SPACE flat cache (the layout of
    kernels.llama_layer: rope partners split across halves; GQA queries
    arrive as n_rep consecutive Ekv blocks). q_att: (B, E) f32 UNscaled
    attn-space query rows; cache (B, T, Ekv); returns (B, E) attn-space."""
    B, E = q_att.shape
    Ekv = n_head_kv * head_dim
    n_rep = n_head // n_head_kv
    scale = 1.0 / (head_dim ** 0.5)
    T = k_cache.shape[1]
    Tc = pick_chunk(T, E=Ekv, itemsize=k_cache.dtype.itemsize)
    from .config import mm_dot_mode

    out = _call_flash_decode(
        (q_att.astype(jnp.float32) * scale).reshape(B * n_rep, Ekv),
        k_new.astype(jnp.float32), v_new.astype(jnp.float32),
        k_cache, v_cache, jnp.asarray(npast, jnp.int32).reshape(B),
        n_head_kv, head_dim, n_rep, Tc, layout="attn", mode=mm_dot_mode())
    return out.reshape(B, E)
