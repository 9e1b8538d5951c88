"""Whole-layer GPT-2 decode megakernel: ONE pallas call per transformer
block — ln1 → qkv → cached causal attention → proj (+residual) → ln2 →
gelu-MLP (+residual) — for single-token (b=1) decode.

Why: a GPT-2 124M decode step is launch/glue-bound (PERFORMANCE.md: 0.44 of
its HBM roofline with ~37 kernel launches + the XLA attention/layernorm ops
between them). This folds a block's FIVE weight streams and every
intermediate op into one phased-grid pallas call (12 calls + lm head per
step), so the step's cost collapses toward pure weight DMA. It extends the
GGML_OP_FLASH_FF idea the reference declares but never implements
(Ggml.cs:3478-3500, 8724-8731) to the whole block.

Design — the wire-order convention (generalizes kernels/mlp_fused.py):

* Every E-wide activation between matmuls lives in the Q8 SWAR k-order
  σ = q8_korder_perm(E) ("wire order"), so every weight consumes it with its
  STANDARD swar packing and zero in-kernel shuffles. Weights PRODUCING a
  wire vector get their output rows permuted by σ at pack time (scales and
  biases ride along; N-axis permutes never touch quant blocks). LayerNorm is
  permutation-invariant (mean/var over the full row), so ln runs directly on
  wire vectors with σ-permuted gains/biases.

* Attention without a head transpose: in wire order, lane j holds logical
  element σ(j), which belongs to head h(j) = σ(j)//D — pure lane arithmetic.
  Per-head score reduction is a lane-segmented sum, expressed as ONE MXU dot
  against an iota-built one-hot head matrix OH[j, h] = (h(j) == h):
      S(T,H)   = (K ∘ q)·OH          # scores for every cached position
      P(T,H)   = softmax_T(mask(S))
      out(1,E) = Σ_T (P·OHᵀ) ∘ V     # head-broadcast via the same one-hot
  The new token's K/V never round-trip through HBM: its score row overwrites
  row `npast` of S, and its V contribution is added explicitly. The K/V
  cache stays OUTSIDE the kernel in flat wire layout [T, E] (bf16), updated
  with one dynamic row write per layer by the caller.

* Phased sequential grid (mlp_fused trick): qkv tiles → 1 attention step →
  proj tiles → fc tiles (first one computes ln2) → cproj tiles. Pallas
  double-buffers the packed weight blocks across grid steps, so weight DMA
  overlaps compute exactly as in the per-matmul kernels, at 1/5 the calls.

Numerics: intermediates stay f32 in VMEM; the ggml activation-quantization
round-trip (INIT trick) is applied by the caller to the block INPUT only —
internal h never leaves VMEM (strictly more exact than the unfused path,
same contract as mlp_fused).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import GType
from ..quant.formats import (
    QTensor, from_storage_order, swar_pack_scales, swar_pack_values_q8,
)
from .config import interpret_mode
from .mlp_fused import _kernel_gelu, _pick_tile as _pick, q8_korder_perm

_NEG = -1e30


def _pick_tile(n: int, k: int) -> int:
    """q8 transients: w + d16 = 8·k·t bytes (mlp_fused._pick_tile)."""
    return _pick(n, k, f=8, tiers=(512, 384, 256, 128))


def gpt2_layer_fuse_supported(E: int, F: int) -> bool:
    """True when a (E, F) GPT-2 block fits the megakernel's tile/alignment
    constraints — keep the caller's gate next to the kernel."""
    return (E % 128 == 0 and F % 128 == 0
            and all((_pick_tile(3 * E, E), _pick_tile(E, E),
                     _pick_tile(F, E), _pick_tile(E, F))))


def fuse_gpt2_layer(blk) -> dict:
    """Pack one GPT-2 block into wire-order Q8_0 megakernel planes.
    blk: the raw param dict (ln_1/attn/ln_2/mlp). Weights may be f32/bf16
    arrays (quantized here) or pre-quantized Q8_0 QTensors (e.g. a
    GGUF-imported model) — their payload bits are reused unchanged (all
    four packs are pure row permutations)."""
    from ..quant.quantize import quantize

    wqkv = blk["attn"]["c_attn_w"]
    wp = blk["attn"]["c_proj_w"]
    wfc = blk["mlp"]["c_fc_w"]
    wcp = blk["mlp"]["c_proj_w"]
    E = wp.shape[0]
    F = wfc.shape[0]
    sE = q8_korder_perm(E)
    sF = q8_korder_perm(F)
    perm3 = np.concatenate([sE, E + sE, 2 * E + sE])

    def pack(w, rows):
        if not isinstance(w, QTensor):
            w = quantize(jnp.asarray(w, jnp.float32), GType.Q8_0)
        vals = from_storage_order(w.planes["qs"], 32).astype(jnp.int32)
        return (swar_pack_values_q8(vals[rows], 1),
                swar_pack_scales(w.planes["d"][rows], 1))

    qs_a, d_a = pack(wqkv, perm3)
    qs_p, d_p = pack(wp, sE)
    qs_f, d_f = pack(wfc, sF)
    qs_c, d_c = pack(wcp, sE)
    f32 = lambda a, p: jnp.asarray(a, jnp.float32)[p].reshape(1, -1)
    return {
        "qs_a": qs_a, "d_a": d_a, "b_a": f32(blk["attn"]["c_attn_b"], perm3),
        "qs_p": qs_p, "d_p": d_p, "b_p": f32(blk["attn"]["c_proj_b"], sE),
        "qs_f": qs_f, "d_f": d_f, "b_f": f32(blk["mlp"]["c_fc_b"], sF),
        "qs_c": qs_c, "d_c": d_c, "b_c": f32(blk["mlp"]["c_proj_b"], sE),
        "ln1_g": f32(blk["ln_1"]["g"], sE), "ln1_b": f32(blk["ln_1"]["b"], sE),
        "ln2_g": f32(blk["ln_2"]["g"], sE), "ln2_b": f32(blk["ln_2"]["b"], sE),
    }


def _onehot_heads(H, C, D, shape, head_axis):
    """OH[j, h] (or transposed) = 1.0 where wire lane j belongs to head h:
    h(j) = σ(j)//D with σ(j) = 32·(j mod C) + j//C. Built from iota — no
    constant traffic."""
    wire_axis = 1 - head_axis
    j = jax.lax.broadcasted_iota(jnp.int32, shape, wire_axis)
    h = jax.lax.broadcasted_iota(jnp.int32, shape, head_axis)
    hj = (32 * (j % C) + j // C) // D
    return (hj == h).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("E", "H", "F", "T", "eps", "b"))
def _call_gpt2_layer(x, kc, vc, npast, planes, E, H, F, T, eps, b):
    """x: (b, E) f32 wire order (row 0 live); kc/vc: (T, E) wire-order cache
    (any float dtype); npast: (1,) int32. Returns (y (b,E) wire,
    k_new (1,E), v_new (1,E))."""
    C = E // 32
    D = E // H
    t1, t2 = _pick_tile(3 * E, E), _pick_tile(E, E)
    t3, t4 = _pick_tile(F, E), _pick_tile(E, F)
    g1, g2, g3, g4 = 3 * E // t1, E // t2, F // t3, E // t4
    jA, jP, jF, jC = 0, g1 + 1, g1 + 1 + g2, g1 + 1 + g2 + g3
    scale = 1.0 / (D ** 0.5)

    def kernel(np_ref, x_ref, kc_ref, vc_ref,
               qs_a, d_a, b_a, qs_p, d_p, b_p, qs_f, d_f, b_f,
               qs_c, d_c, b_c, l1g, l1b, l2g, l2b,
               y_ref, kn_ref, vn_ref,
               xn_s, qkv_s, at_s, x2_s, x2n_s, h_s):
        from .matmul_q import _decode_f16x2_rows

        j = pl.program_id(0)

        def dot(a, w):
            return jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        def unpack_q8(qs_ref, d_ref):
            v = pltpu.bitcast(qs_ref[:], jnp.int8)
            d16 = pltpu.repeat(_decode_f16x2_rows(d_ref), 32, axis=0)
            return v.astype(jnp.float32) * d16

        def ln(xv, g_ref, b_ref):
            xf = xv.astype(jnp.float32)
            mu = jnp.mean(xf, axis=1, keepdims=True)
            c = xf - mu
            var = jnp.mean(c * c, axis=1, keepdims=True)
            return c * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]

        @pl.when(j == 0)
        def _ln1():
            xn_s[:] = ln(x_ref[:], l1g, l1b)

        @pl.when(j < g1)
        def _qkv():
            w = unpack_q8(qs_a, d_a)
            qkv_s[:, pl.dslice(j * t1, t1)] = dot(xn_s[:], w) + b_a[:]

        @pl.when(j == g1)
        def _attention():
            npast = np_ref[0]
            q = qkv_s[0:1, 0:E] * scale
            kn = qkv_s[0:1, E : 2 * E]
            vn = qkv_s[0:1, 2 * E : 3 * E]
            kn_ref[:] = kn
            vn_ref[:] = vn
            tpos = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
            OH = _onehot_heads(H, C, D, (E, H), 1)
            kf = kc_ref[:].astype(jnp.float32)
            S = dot(kf * q, OH)  # (T, H); q broadcasts over rows
            s_new = dot(kn * q, OH)  # (1, H)
            S = jnp.where(tpos == npast, s_new, S)
            S = jnp.where(tpos <= npast, S, _NEG)
            m = jnp.max(S, axis=0, keepdims=True)
            e = jnp.exp(S - m)
            p = e / jnp.sum(e, axis=0, keepdims=True)  # (T, H)
            OHT = _onehot_heads(H, C, D, (H, E), 0)
            Pexp = dot(p, OHT)  # (T, E) per-lane head weight
            vf = vc_ref[:].astype(jnp.float32)
            vm = jnp.where(tpos == npast, 0.0, vf)  # stale new row
            out = jnp.sum(Pexp * vm, axis=0, keepdims=True)
            pn = jnp.sum(jnp.where(tpos == npast, p, 0.0), axis=0,
                         keepdims=True)  # (1, H)
            out = out + dot(pn, OHT) * vn
            at_s[:] = jnp.broadcast_to(out, at_s.shape)

        @pl.when((j >= jP) & (j < jF))
        def _proj():
            i = j - jP
            w = unpack_q8(qs_p, d_p)
            x2_s[:, pl.dslice(i * t2, t2)] = (
                x_ref[:, pl.dslice(i * t2, t2)]
                + dot(at_s[:], w) + b_p[:])

        @pl.when(j == jF)
        def _ln2():
            x2n_s[:] = ln(x2_s[:], l2g, l2b)

        @pl.when((j >= jF) & (j < jC))
        def _fc():
            i = j - jF
            w = unpack_q8(qs_f, d_f)
            h_s[:, pl.dslice(i * t3, t3)] = _kernel_gelu(
                dot(x2n_s[:], w) + b_f[:])

        @pl.when(j >= jC)
        def _cproj():
            w = unpack_q8(qs_c, d_c)
            y_ref[:] = (x2_s[:, pl.dslice((j - jC) * t4, t4)]
                        + dot(h_s[:], w) + b_c[:])

    cA = lambda j: (0, jnp.minimum(j, g1 - 1))
    cP = lambda j: (0, jnp.clip(j - jP, 0, g2 - 1))
    cF = lambda j: (0, jnp.clip(j - jF, 0, g3 - 1))
    cC = lambda j: (0, jnp.clip(j - jC, 0, g4 - 1))
    full = lambda j: (0, 0)
    vspec = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
    grid = g1 + 1 + g2 + g3 + g4
    y, kn, vn = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # npast
            vspec((b, E), full),                     # x
            vspec((T, E), full), vspec((T, E), full),  # k/v cache
            vspec((E // 4, t1), cA), vspec((E // 64, t1), cA),
            vspec((1, t1), cA),                      # qkv planes + bias
            vspec((E // 4, t2), cP), vspec((E // 64, t2), cP),
            vspec((1, t2), cP),                      # proj
            vspec((E // 4, t3), cF), vspec((E // 64, t3), cF),
            vspec((1, t3), cF),                      # fc
            vspec((F // 4, t4), cC), vspec((F // 64, t4), cC),
            vspec((1, t4), cC),                      # cproj
            vspec((1, E), full), vspec((1, E), full),  # ln1 g/b
            vspec((1, E), full), vspec((1, E), full),  # ln2 g/b
        ],
        out_specs=[
            vspec((b, t4), cC),
            vspec((1, E), full), vspec((1, E), full),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, E), jnp.float32),      # xn
            pltpu.VMEM((b, 3 * E), jnp.float32),  # qkv
            pltpu.VMEM((b, E), jnp.float32),      # attn out
            pltpu.VMEM((b, E), jnp.float32),      # x2
            pltpu.VMEM((b, E), jnp.float32),      # ln2(x2)
            pltpu.VMEM((b, F), jnp.float32),      # h
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * E * (3 * E + E + 2 * F) + 4 * T * E,
            bytes_accessed=(3 * E * E + E * E + 2 * E * F) + 2 * T * E * 2,
            transcendentals=b * F + T * H,
        ),
    )(npast, x, kc, vc,
      planes["qs_a"], planes["d_a"], planes["b_a"],
      planes["qs_p"], planes["d_p"], planes["b_p"],
      planes["qs_f"], planes["d_f"], planes["b_f"],
      planes["qs_c"], planes["d_c"], planes["b_c"],
      planes["ln1_g"], planes["ln1_b"], planes["ln2_g"], planes["ln2_b"])
    return y, kn, vn


def gpt2_layer_step(fused: dict, x_wire, k_cache, v_cache, npast,
                    n_head: int, ln_eps: float):
    """One decode step through a fused block. x_wire: (1, E) f32 wire order;
    k_cache/v_cache: (T, E) wire-order prefix slice (bucketed); npast: int32
    scalar array. Returns (y_wire (1, E), k_new (1, E), v_new (1, E))."""
    E = x_wire.shape[-1]
    F = fused["qs_f"].shape[1]
    T = k_cache.shape[0]
    x8 = jnp.pad(x_wire.astype(jnp.float32), ((0, 7), (0, 0)))
    y, kn, vn = _call_gpt2_layer(
        x8, k_cache, v_cache, jnp.reshape(npast, (1,)).astype(jnp.int32),
        fused, E, n_head, F, T, float(ln_eps), 8)
    return y[:1], kn, vn
