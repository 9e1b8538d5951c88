"""Whole-layer llama decode megakernel: ONE pallas call per transformer
block — rms1 → fused qkv → rope → cached causal attention → wo(+residual)
→ rms2 → SwiGLU MLP(+residual) — for single-token (b=1, MHA) decode on
Q4_0 SWAR planes.

A 7B decode step spends ~1-2 ms outside the matmul kernels: per-call gaps
(~11 us x 129 launches, measured in the in-jit matmul-only chain,
PERFORMANCE.md) plus the XLA rope/norm/attention segments between them.
This collapses a block's four weight streams and every intermediate op
into one phased sequential grid (~180 steps/layer at 7B shapes), the
direct extension of kernels/gpt2_layer.py to the llama architecture
(the whole-block composition of the reference's declared-but-stubbed
FLASH_ATTN + FLASH_FF fused ops, Ggml.cs:3454-3500, 8724-8731).

Conventions (see gpt2_layer.py for the wire-order idea):

* E-wide activations between matmuls live in the Q4 SWAR combined
  [lo; hi] k-order ("wire", sigma = mlp_fused.q4_korder_perm): any
  standard-packed Q4 weight consumes a wire vector as
  dot(x[:, :k/2], w_lo) + dot(x[:, k/2:], w_hi) with zero in-kernel
  shuffles; producers get output rows sigma-permuted at pack time.
  RMSNorm is permutation-invariant, so it runs on wire vectors with
  sigma-permuted gains.

* Attention space is rope-friendly: position j < E/2 holds (head
  h = j//(D/2) ... within-half), its rope PARTNER lives at j + E/2, so
  rotation is two aligned half-vector multiplies against cos/sin lane
  vectors (computed outside from npast; both GGML rope modes are just
  different pack-time lane assignments, same kernel math). Per-head
  score/broadcast uses the iota-built one-hot dots of attn_decode; the
  fresh token's roped K/V seed the online-softmax recurrence and are
  emitted for the caller's one cache-row write. The cache stays outside
  in flat [T, E] ATTN-SPACE layout, streamed through VMEM in chunks.

* wo consumes attention output (attn-space) via a pack-time COLUMN
  regroup (the fused copy is re-quantized from f32, standard planes are
  kept for parity/export); w_down rides the K-padded layout
  (zero blocks past F) with its pad lanes masked at the SwiGLU combine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import GType
from .attn_decode import _onehot
from .config import interpret_mode
from .mlp_fused import _TILE_BYTES, _pick_tile as _pick, q4_korder_perm

_NEG = -1e30


def _pick_tile(n: int, kc: int) -> int:
    """q4 transients: wlo + whi + d16 = 6·kc·t bytes."""
    return _pick(n, kc, f=6, tiers=(512, 384, 256, 128))


def _down_chunks(kp: int, t: int) -> int:
    """Fewest chunks whose kc fits the budget with 512-multiple kc."""
    for nc in range(1, kp // 512 + 2):
        if kp % nc:
            continue
        kc = kp // nc
        if (nc == 1 or kc % 512 == 0) and kc % 64 == 0 \
                and 6 * kc * t <= _TILE_BYTES:
            return nc
    raise ValueError(f"no w_down chunking for kp={kp}, t={t}")


def a2e_map(E: int, D: int, mode: int) -> np.ndarray:
    """attn-space position -> logical (head-major) element. Both halves
    pair rope partners at +E/2: mode 0 (GGML interleaved) pairs (2t,2t+1),
    mode 2 (neox) pairs (t, t+D/2)."""
    half = E // 2
    p = np.arange(half)
    h = p // (D // 2)
    t = p % (D // 2)
    if mode == 2:
        first, second = h * D + t, h * D + t + D // 2
    else:
        first, second = h * D + 2 * t, h * D + 2 * t + 1
    return np.concatenate([first, second])


def llama_layer_fuse_supported(cfg) -> bool:
    E, F = cfg.n_embd, cfg.n_ff
    Ekv = cfg.n_head_kv * cfg.head_dim
    if cfg.n_head % cfg.n_head_kv or cfg.head_dim % 2:
        return False
    # rope halves and q sub-blocks must be 128-lane aligned
    if E % 256 or Ekv % 256:
        return False
    kp = -(-F // 512) * 512
    try:
        _down_chunks(kp, 256)
    except ValueError:
        return False
    return all((_pick_tile(E + 2 * Ekv, E), _pick_tile(E, E),
                _pick_tile(2 * kp, E)))


def fuse_llama_layer(blk_raw: dict, cfg) -> dict:
    """Pack one llama block into megakernel planes. blk_raw needs wq/wk/wv
    (or wqkv pre-concat), wo, w_gate/w_up (or w_gate_up), w_down,
    attn_norm, ffn_norm. Weights may be f32/bf16 arrays or pre-quantized
    Q4_0 QTensors (GGUF-imported): qkv/gate_up/w_down packs are pure row
    permutations (+ zero pad blocks) reusing the payload bits; only wo is
    re-quantized (its input columns regroup — from dequantize when the
    source is a QTensor)."""
    from ..quant.formats import (
        QTensor, from_storage_order, swar_pack_scales, swar_pack_values,
        unpack_nibbles,
    )
    from ..quant.quantize import dequantize, quantize

    E, D, F = cfg.n_embd, cfg.head_dim, cfg.n_ff
    Ekv = cfg.n_head_kv * D
    n_rep = cfg.n_head // cfg.n_head_kv
    kp = -(-F // 512) * 512
    sigE = q4_korder_perm(E)
    sigKp = q4_korder_perm(kp)
    # attn space per kv-group block: position (r·Ekv + j) of the fused q
    # output holds q head (e_kv[j]//D)·n_rep + r, dim e_kv[j] % D
    a2e_kv = a2e_map(Ekv, D, cfg.rope_mode)
    a2e = np.concatenate([
        (a2e_kv // D * n_rep + r) * D + a2e_kv % D for r in range(n_rep)
    ])  # len E: q attn-pos -> q element

    def vals_d(w, pad_to=None):
        """→ (nibble values (N, K[p]) int, d (N, C[p]) f16) from a raw
        float weight or a pre-SWAR Q4_0 QTensor; optional zero K-pad."""
        if isinstance(w, QTensor):
            q = w
        else:
            q = quantize(jnp.asarray(w, jnp.float32), GType.Q4_0)
        k = q.shape[-1]
        vals = from_storage_order(unpack_nibbles(q.planes["qs"], k), 32)
        d = q.planes["d"]
        if pad_to is not None and pad_to != k:
            # pad value 8 ≡ dequant 0 with any d; pad d = 0 regardless
            vals = jnp.pad(vals, ((0, 0), (0, pad_to - k)),
                           constant_values=8)
            d = jnp.pad(d, ((0, 0), (0, (pad_to - k) // 32)))
        return vals, d

    def cat2(a, b):
        va, da = vals_d(a)
        vb, db = vals_d(b)
        return jnp.concatenate([va, vb], 0), jnp.concatenate([da, db], 0)

    if "wqkv" in blk_raw:
        v_qkv, d_qkv = vals_d(blk_raw["wqkv"])
    else:
        vq, dq_ = vals_d(blk_raw["wq"])
        vk, dk = vals_d(blk_raw["wk"])
        vv, dv = vals_d(blk_raw["wv"])
        v_qkv = jnp.concatenate([vq, vk, vv], 0)
        d_qkv = jnp.concatenate([dq_, dk, dv], 0)
    if "w_gate_up" in blk_raw:
        v_gu, d_gu = vals_d(blk_raw["w_gate_up"])
    else:
        v_gu, d_gu = cat2(blk_raw["w_gate"], blk_raw["w_up"])
    wo = blk_raw["wo"]
    wo = dequantize(wo) if isinstance(wo, QTensor) else \
        jnp.asarray(wo, jnp.float32)
    v_dn, d_dn = vals_d(blk_raw["w_down"], pad_to=kp)

    def pack_vd(vals, d, rows=None):
        if rows is not None:
            vals, d = vals[rows], d[rows]
        return swar_pack_values(vals, 1), swar_pack_scales(d, 1)

    def pack(w_f32, rows=None):
        q = quantize(w_f32, GType.Q4_0)
        vals = from_storage_order(
            unpack_nibbles(q.planes["qs"], w_f32.shape[-1]), 32)
        return pack_vd(vals, q.planes["d"], rows)

    # qkv: output rows in attn space (q | k | v), k-axis standard (wire in)
    perm3 = np.concatenate([a2e, E + a2e_kv, E + Ekv + a2e_kv])
    qs_a, d_a = pack_vd(v_qkv, d_qkv, perm3)
    # wo consumes the attn-space output directly: kernel lane i reads vals
    # column sigE(i), and we want it to be wo column a2e[i] — so regroup
    # the input columns (re-quantizing the fused copy from f32; the
    # standard planes keep parity/export bit-exactness)
    colperm = a2e[np.argsort(sigE)]
    qs_o, d_o = pack(wo[:, jnp.asarray(colperm)], sigE)
    # gate_up: wire in (standard), rows so silu(g)*u lands in w_down's
    # combined k-order over the PADDED kp. Pad positions (sigKp >= F) have
    # no real row — row 0 is a harmless placeholder, the combine step
    # masks those lanes to zero AND w_down's pad blocks are zero.
    gu_rows = np.where(sigKp < F, sigKp, 0)
    rows_gu = np.concatenate([gu_rows, F + gu_rows])
    qs_g, d_g = pack_vd(v_gu, d_gu, rows_gu)
    # w_down: K padded with zero blocks; wire out rows
    qs_d, d_d = pack_vd(v_dn, d_dn, sigE)
    wire = lambda g: jnp.asarray(g, jnp.float32)[sigE].reshape(1, E)
    return {
        "qs_a": qs_a, "d_a": d_a, "qs_o": qs_o, "d_o": d_o,
        "qs_g": qs_g, "d_g": d_g, "qs_d": qs_d, "d_d": d_d,
        "g1": wire(blk_raw["attn_norm"]), "g2": wire(blk_raw["ffn_norm"]),
    }


@functools.partial(
    jax.jit,
    static_argnames=("E", "H", "Hkv", "F", "kp", "T", "Tc", "eps", "b"))
def _call_llama_layer(x, cosv, sinv, kc, vc, npast, planes,
                      E, H, Hkv, F, kp, T, Tc, eps, b):
    """x: (b, E) f32 wire (row 0 live); cosv/sinv: (1, Ekv/2); kc/vc:
    (T, Ekv) attn-space cache; npast: (1,) int32. Returns (y (b,E) wire,
    k_new (1,Ekv), v_new (1,Ekv) attn-space, roped)."""
    D = E // H
    n_rep = H // Hkv
    Ekv = Hkv * D
    halfkv = Ekv // 2
    t1 = _pick_tile(E + 2 * Ekv, E)
    t2 = _pick_tile(E, E)
    t3 = _pick_tile(2 * kp, E)
    t4 = 256 if E % 256 == 0 else 128
    nc4 = _down_chunks(kp, t4)
    kc4 = kp // nc4
    nchT = T // Tc
    g1, g2, g3 = (E + 2 * Ekv) // t1, E // t2, 2 * kp // t3
    g4n = E // t4
    jB, jC, jD, jE = g1, g1 + nchT, g1 + nchT + g2, g1 + nchT + g2 + g3
    grid = jE + g4n * nc4
    scale = 1.0 / (D ** 0.5)

    from .matmul_q import _decode_f16x2_rows

    def kernel(np_ref, x_ref, cos_ref, sin_ref, kc_ref, vc_ref,
               qs_a, d_a, qs_o, d_o, qs_g, d_g, qs_d, d_d, g1_ref, g2_ref,
               y_ref, kn_ref, vn_ref,
               xn_s, qkv_s, at_s, x2_s, x2n_s, h_s, h2_s, m_s, l_s, a_s):
        j = pl.program_id(0)

        def dot(a, w):
            return jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        def unpack_q4(qs_ref, d_ref):
            p = qs_ref[:]
            mask = jnp.uint32(0x0F0F0F0F)
            vlo = pltpu.bitcast(p & mask, jnp.int8)
            vhi = pltpu.bitcast((p >> jnp.uint32(4)) & mask, jnp.int8)
            d16 = pltpu.repeat(_decode_f16x2_rows(d_ref), 16, axis=0)
            return ((vlo.astype(jnp.float32) - 8.0) * d16,
                    (vhi.astype(jnp.float32) - 8.0) * d16)

        def mm(xw, qs_ref, d_ref, kk):
            wlo, whi = unpack_q4(qs_ref, d_ref)
            return dot(xw[:, : kk // 2], wlo) + dot(xw[:, kk // 2 :], whi)

        def rms(xv, g_ref):
            xf = xv.astype(jnp.float32)
            ms = jnp.mean(xf * xf, axis=1, keepdims=True)
            return xf * jax.lax.rsqrt(ms + eps) * g_ref[:]

        def rope(v1):  # (1, Ekv) attn-space block -> roped
            a = v1[:, :halfkv]
            bb = v1[:, halfkv:]
            return jnp.concatenate(
                [a * cos_ref[:] - bb * sin_ref[:],
                 a * sin_ref[:] + bb * cos_ref[:]], axis=1)

        @pl.when(j == 0)
        def _rms1():
            xn_s[:] = rms(x_ref[:], g1_ref)

        @pl.when(j < g1)
        def _qkv():
            qkv_s[:, pl.dslice(j * t1, t1)] = mm(xn_s[:], qs_a, d_a, E)

        # --- attention: nchT chunked online-softmax steps, n_rep
        # kv-aligned sub-queries (GQA: q block r lives at lanes
        # [r·Ekv, (r+1)·Ekv) of the fused q output) --------------------
        def onehot(shape, head_axis):
            # the SAME attn-space lane→head map flash_decode_flat_attn uses
            # to read this cache layout (kernels.attn_decode._onehot)
            return _onehot(Ekv, Hkv, D, shape, head_axis, layout="attn")

        @pl.when(j == jB)
        def _attn_init():
            kn = rope(qkv_s[0:1, E : E + Ekv])
            vn = qkv_s[0:1, E + Ekv : E + 2 * Ekv]
            kn_ref[:] = kn
            vn_ref[:] = vn
            OH = onehot((Ekv, Hkv), 1)
            for r in range(n_rep):
                qr = rope(qkv_s[0:1, r * Ekv : (r + 1) * Ekv]) * scale
                at_s[:, r * Ekv : (r + 1) * Ekv] = jnp.broadcast_to(
                    qr, (at_s.shape[0], Ekv))  # stash roped q blocks
                m_s[r : r + 1] = dot(kn * qr, OH)
                l_s[r : r + 1] = jnp.ones((1, Hkv), jnp.float32)
                a_s[r : r + 1] = vn

        @pl.when((j >= jB) & (j < jC))
        def _attn_chunk():
            jc = j - jB
            npast = np_ref[0]
            OH = onehot((Ekv, Hkv), 1)
            OHT = onehot((Hkv, Ekv), 0)
            kf = kc_ref[:].astype(jnp.float32)
            vf = vc_ref[:].astype(jnp.float32)
            idx = jc * Tc + jax.lax.broadcasted_iota(
                jnp.int32, (Tc, 1), 0)
            live = (idx <= npast) & (idx != npast)
            for r in range(n_rep):
                qr = at_s[0:1, r * Ekv : (r + 1) * Ekv]
                S = dot(kf * qr, OH)
                S = jnp.where(live, S, _NEG)
                m_old = m_s[r : r + 1]
                m_new = jnp.maximum(m_old,
                                    jnp.max(S, axis=0, keepdims=True))
                corr = jnp.exp(m_old - m_new)
                P = jnp.exp(S - m_new)
                l_s[r : r + 1] = l_s[r : r + 1] * corr + jnp.sum(
                    P, axis=0, keepdims=True)
                a_s[r : r + 1] = a_s[r : r + 1] * dot(corr, OHT) + jnp.sum(
                    dot(P, OHT) * vf, axis=0, keepdims=True)
                m_s[r : r + 1] = m_new

        @pl.when(j == jC - 1)
        def _attn_final():
            OHT = onehot((Hkv, Ekv), 0)
            for r in range(n_rep):
                out = a_s[r : r + 1] / dot(l_s[r : r + 1], OHT)
                at_s[:, r * Ekv : (r + 1) * Ekv] = jnp.broadcast_to(
                    out, (at_s.shape[0], Ekv))

        @pl.when((j >= jC) & (j < jD))
        def _wo():
            i = j - jC
            x2_s[:, pl.dslice(i * t2, t2)] = (
                x_ref[:, pl.dslice(i * t2, t2)]
                + mm(at_s[:], qs_o, d_o, E))

        @pl.when(j == jD)
        def _rms2():
            x2n_s[:] = rms(x2_s[:], g2_ref)

        @pl.when((j >= jD) & (j < jE))
        def _gate_up():
            i = j - jD
            h_s[:, pl.dslice(i * t3, t3)] = mm(x2n_s[:], qs_g, d_g, E)

        @pl.when(j == jE)
        def _combine():
            g = h_s[:, :kp]
            u = h_s[:, kp:]
            prod = g * (1.0 / (1.0 + jnp.exp(-g))) * u
            # mask pad positions (combined k-order elements >= F)
            ii = jax.lax.broadcasted_iota(jnp.int32, (b, kp), 1)
            Ckp = kp // 32
            lo = ii < kp // 2
            i2 = jnp.where(lo, ii, ii - kp // 2)
            elem = 32 * (i2 % Ckp) + 2 * (i2 // Ckp) + jnp.where(lo, 0, 1)
            h2_s[:] = jnp.where(elem < F, prod, 0.0)

        @pl.when(j >= jE)
        def _down():
            jj = j - jE
            i = jj // nc4   # n-tile OUTER
            c = jj % nc4    # k-chunk INNER

            @pl.when(c == 0)
            def _init():
                y_ref[:] = x2_s[:, pl.dslice(i * t4, t4)]

            wlo, whi = unpack_q4(qs_d, d_d)
            y_ref[:] = y_ref[:] + (
                dot(h2_s[:, pl.dslice(c * (kc4 // 2), kc4 // 2)], wlo)
                + dot(h2_s[:, pl.dslice(kp // 2 + c * (kc4 // 2),
                                        kc4 // 2)], whi))

    # --- specs ----------------------------------------------------------
    cA = lambda j: (0, jnp.minimum(j, g1 - 1))
    cT = lambda j: (jnp.clip(j - jB, 0, nchT - 1), 0)
    cC = lambda j: (0, jnp.clip(j - jC, 0, g2 - 1))
    cD = lambda j: (0, jnp.clip(j - jD, 0, g3 - 1))
    cEn = lambda j: (0, jnp.clip((j - jE) // nc4, 0, g4n - 1))
    cEk = lambda j: (jnp.clip((j - jE) % nc4, 0, nc4 - 1),
                     jnp.clip((j - jE) // nc4, 0, g4n - 1))
    full = lambda j: (0, 0)
    vspec = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    y, kn, vn = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # npast
            vspec((b, E), full),                        # x
            vspec((1, halfkv), full), vspec((1, halfkv), full),  # cos/sin
            vspec((Tc, Ekv), cT), vspec((Tc, Ekv), cT),  # cache chunks
            vspec((E // 8, t1), cA), vspec((E // 64, t1), cA),   # qkv
            vspec((E // 8, t2), cC), vspec((E // 64, t2), cC),   # wo
            vspec((E // 8, t3), cD), vspec((E // 64, t3), cD),   # gate_up
            vspec((kc4 // 8, t4), cEk), vspec((kc4 // 64, t4), cEk),  # down
            vspec((1, E), full), vspec((1, E), full),   # norm gains
        ],
        out_specs=[
            vspec((b, t4), cEn),
            vspec((1, Ekv), full), vspec((1, Ekv), full),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, E), jnp.float32),
            jax.ShapeDtypeStruct((1, Ekv), jnp.float32),
            jax.ShapeDtypeStruct((1, Ekv), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, E), jnp.float32),        # xn
            pltpu.VMEM((b, E + 2 * Ekv), jnp.float32),  # qkv
            pltpu.VMEM((b, E), jnp.float32),        # roped q / attn out
            pltpu.VMEM((b, E), jnp.float32),        # x2
            pltpu.VMEM((b, E), jnp.float32),        # rms2(x2)
            pltpu.VMEM((b, 2 * kp), jnp.float32),   # gate/up raw (wire)
            pltpu.VMEM((b, kp), jnp.float32),       # silu(g)*u
            pltpu.VMEM((n_rep, Hkv), jnp.float32),  # m
            pltpu.VMEM((n_rep, Hkv), jnp.float32),  # l
            pltpu.VMEM((n_rep, Ekv), jnp.float32),  # acc
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * E * (E + 2 * Ekv + E + 2 * F) + 2 * b * E * kp
            + 4 * n_rep * T * Ekv,
            bytes_accessed=(E * (E + 2 * Ekv) + E * E + 2 * E * F
                            + E * kp) // 2
            + 2 * T * Ekv * kc.dtype.itemsize,
            transcendentals=b * F + T * H,
        ),
    )(npast, x, cosv, sinv, kc, vc,
      planes["qs_a"], planes["d_a"], planes["qs_o"], planes["d_o"],
      planes["qs_g"], planes["d_g"], planes["qs_d"], planes["d_d"],
      planes["g1"], planes["g2"])
    return y, kn, vn


def llama_layer_step(fused: dict, x_wire, k_cache, v_cache, npast,
                     cfg):
    """One decode step through a fused llama block. x_wire: (1, E) f32;
    k_cache/v_cache: (T, Ekv) attn-space slices; npast: int32 scalar."""
    E, D, F = cfg.n_embd, cfg.head_dim, cfg.n_ff
    Ekv = cfg.n_head_kv * D
    kp = -(-F // 512) * 512
    from .attn_decode import pick_chunk

    T = k_cache.shape[0]
    Tc = pick_chunk(T, cap=256)
    # rope cos/sin lane vectors for this position (one kv-group block;
    # every q sub-block shares the pattern): pair index t = p % (D/2)
    halfkv = Ekv // 2
    t = (jnp.arange(halfkv) % (D // 2)).astype(jnp.float32)
    theta = npast.astype(jnp.float32) * (
        cfg.rope_base ** (-2.0 * t / D))
    cosv = jnp.cos(theta).reshape(1, halfkv)
    sinv = jnp.sin(theta).reshape(1, halfkv)
    x8 = jnp.pad(x_wire.astype(jnp.float32), ((0, 7), (0, 0)))
    y, kn, vn = _call_llama_layer(
        x8, cosv, sinv, k_cache, v_cache,
        jnp.reshape(npast, (1,)).astype(jnp.int32), fused,
        E, cfg.n_head, cfg.n_head_kv, F, kp, T, Tc,
        float(cfg.rms_eps), 8)
    return y[:1], kn, vn
