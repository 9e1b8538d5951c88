"""Fused quantized-MLP megakernel: gelu(x·W1ᵀ+b1)·W2ᵀ+b2 in ONE pallas call.

This is the TPU realization of GGML_OP_FLASH_FF — the reference declares the
fused feed-forward op and budgets its work size (Ggml.cs:3478-3500) but never
implements the kernel (Ggml.cs:8724-8731 asserts false). Here it exists to
kill per-pallas-call dispatch overhead (~12 µs/call on v5e through the relay):
a GPT-2 decode step is glue-bound (PERFORMANCE.md — 124M runs at 0.44 of its
HBM roofline with ~50 kernel launches), and fusing each block's two MLP
matmuls plus the GELU between them removes a third of the launches and all
the XLA round-trips between them.

Two tricks make the fusion TPU-shaped:

1. k-order chaining. The intermediate h = gelu(x·W1ᵀ+b1) must enter the
   second matmul in W2's SWAR k-order (quant/formats.py module comment — the
   order is pinned by `pltpu.repeat` scale expansion + the 32→8 sublane
   bitcast). Instead of permuting h in-kernel (a gather Mosaic would
   serialize), W1's OUTPUT axis is permuted at pack time: lane j of the
   repacked W1 planes holds the weight row producing the element W2 expects
   at k-position j, so h comes out of the first dot already in W2's order.
   Dot products are permutation-invariant, so results match the unfused
   pipeline's math (modulo skipping the optional re-quantization of h, which
   only makes it MORE exact — h never leaves VMEM).

2. Phased grid. A grid-less call would have to land EVERY weight byte in
   VMEM before the kernel starts — serial DMA, no overlap (measured: 124M
   decode dropped 2558 → 1696 tok/s that way). Instead the call runs a
   sequential grid of g1+g2 steps: steps [0, g1) each unpack one W1 column
   tile and write gelu(x·W1ᵀ+b1) into a VMEM scratch slice; steps [g1, g1+g2)
   each unpack one W2 column tile and emit an output tile from the full
   scratch. Pallas double-buffers the streamed weight blocks across grid
   steps, so DMA overlaps compute exactly as in the per-matmul kernels —
   while the launch count drops to one. Index maps clamp the inactive
   phase's block index so no block is re-fetched while its phase is idle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import GType
from ..quant.formats import (
    QTensor, from_storage_order, swar_pack_scales, swar_pack_values_q8,
)
from .config import interpret_mode

_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_COEF = 0.044715

_TILE_BYTES = 9 * 1024 * 1024  # per-phase f32 transients (w + d16 tiles);
# leaves ~6 MB of VMEM for the double-buffered packed blocks + scratch
_MAX_FUSED_B = 64  # h = (b, n1) f32 scratch; prefill uses the unfused path


def _kernel_gelu(x):
    # same tanh-approx as ops.basic.gelu (Ggml.cs:2683-2703) so fused and
    # unfused paths agree to f32 rounding
    return 0.5 * x * (
        1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + _GELU_COEF * x * x * x))
    )


def q8_korder_perm(k: int):
    """perm[i] = source element index for k-position i of the nc=1 Q8 SWAR
    activation order (kernels.matmul_q.swar_permute_x_q8)."""
    import numpy as np

    cc = k // 32
    i = np.arange(k)
    return 32 * (i % cc) + i // cc


def _pick_tile(n: int, k: int, f: int = 8,
               tiers: tuple = (512, 256, 128)) -> int:
    """Largest output tile whose f32 unpack transients (f·k·t bytes — f = 8
    for Q8's w+d16 at full-k rows, 6 for 4-bit's wlo+whi+d16 at k/2 rows)
    fit the per-phase budget. Shared by the MLP and whole-layer megakernels
    (which pass their own tier ladders)."""
    for t in tiers:
        if n % t == 0 and f * k * t <= _TILE_BYTES:
            return t
    return 0


def mlp_fuse_supported(w1, w2, b: int | None = None) -> bool:
    """True if (w1, w2) can ride the fused Q8_0 megakernel. w1/w2 must be
    pre-SWAR Q8_0 QTensors (planes qs/d) with w1: (n1, k1), w2: (n2, n1)."""
    if not (isinstance(w1, QTensor) and isinstance(w2, QTensor)):
        return False
    if w1.gtype != GType.Q8_0 or w2.gtype != GType.Q8_0:
        return False
    if "qs" not in w1.planes or "qs" not in w2.planes:
        return False
    if len(w1.shape) != 2 or len(w2.shape) != 2:
        return False
    n1, k1 = w1.shape
    n2, k2 = w2.shape
    if k2 != n1 or k1 % 32 or n1 % 32 or n1 % 128 or n2 % 128 or k1 % 128:
        return False
    if b is not None and b > _MAX_FUSED_B:
        return False
    return bool(_pick_tile(n1, k1)) and bool(_pick_tile(n2, n1))


def fuse_mlp_q8(w1: QTensor, b1, w2: QTensor, b2) -> dict:
    """Pack a GELU-MLP pair into fused-kernel planes. w1 (n1, k1) and
    w2 (n2, k2=n1) must be pre-SWAR Q8_0 QTensors. W1's output axis (and b1)
    is permuted by W2's k-order so h chains with no in-kernel shuffle."""
    n1, k1 = w1.shape
    n2, k2 = w2.shape
    assert k2 == n1, (w1.shape, w2.shape)
    perm = q8_korder_perm(k2)
    vals1 = from_storage_order(w1.planes["qs"], 32).astype(jnp.int32)[perm]
    vals2 = from_storage_order(w2.planes["qs"], 32).astype(jnp.int32)
    return {
        "qs1": swar_pack_values_q8(vals1, 1),
        "d1": swar_pack_scales(w1.planes["d"][perm], 1),
        "b1": jnp.asarray(b1, jnp.float32)[perm].reshape(1, n1),
        "qs2": swar_pack_values_q8(vals2, 1),
        "d2": swar_pack_scales(w2.planes["d"], 1),
        "b2": jnp.asarray(b2, jnp.float32).reshape(1, n2),
    }


@functools.partial(jax.jit, static_argnames=("k1", "n1", "n2", "t1", "t2"))
def _call_mlp_fused_q8(x, planes, k1, n1, n2, t1, t2):
    """x: (b, k1) f32 in W1's q8 swar k-order. Returns (b, n2) f32."""
    b = x.shape[0]
    g1, g2 = n1 // t1, n2 // t2
    cc1, cc2 = k1 // 32, n1 // 32

    def kernel(x_ref, qs1_ref, d1_ref, b1_ref, qs2_ref, d2_ref, b2_ref,
               o_ref, h_ref):
        from .matmul_q import _decode_f16x2_rows

        j = pl.program_id(0)

        def dot(a, w):
            return jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        @pl.when(j < g1)
        def _phase1():
            v = pltpu.bitcast(qs1_ref[:], jnp.int8)
            d16 = pltpu.repeat(_decode_f16x2_rows(d1_ref), 32, axis=0)
            w = v.astype(jnp.float32) * d16
            h = _kernel_gelu(dot(x_ref[:], w) + b1_ref[:])
            h_ref[:, pl.dslice(j * t1, t1)] = h  # t1-aligned lane store

        @pl.when(j >= g1)
        def _phase2():
            v = pltpu.bitcast(qs2_ref[:], jnp.int8)
            d16 = pltpu.repeat(_decode_f16x2_rows(d2_ref), 32, axis=0)
            w = v.astype(jnp.float32) * d16
            o_ref[:] = dot(h_ref[:], w) + b2_ref[:]

    p1 = lambda j: (0, jnp.minimum(j, g1 - 1))
    p2 = lambda j: (0, jnp.clip(j - g1, 0, g2 - 1))
    return pl.pallas_call(
        kernel,
        grid=(g1 + g2,),
        in_specs=[
            pl.BlockSpec((b, k1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1 // 4, t1), p1, memory_space=pltpu.VMEM),
            pl.BlockSpec((cc1 // 2, t1), p1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t1), p1, memory_space=pltpu.VMEM),
            pl.BlockSpec((n1 // 4, t2), p2, memory_space=pltpu.VMEM),
            pl.BlockSpec((cc2 // 2, t2), p2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t2), p2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, t2), p2, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, n1), jnp.float32)],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n1 * (k1 + n2),
            bytes_accessed=n1 * k1 + n2 * n1 + b * (k1 + n2) * 4,
            transcendentals=b * n1,
        ),
    )(x, planes["qs1"], planes["d1"], planes["b1"],
      planes["qs2"], planes["d2"], planes["b2"])


# --- SiLU-gated (llama) variant over 4-bit SWAR planes ---------------------
#
# Same phased-grid shape, three differences: (a) weights are nibble planes
# (lo/hi activation pair, matmul_q SWAR layout); (b) phase 1 computes the
# PRE-activation gate/up rows and the silu(gate)·up combine happens once, at
# the first phase-2 step, entirely in VMEM scratch; (c) W1 = row-concat
# [gate; up] (quant.formats.concat_qtensors — the layout fuse_params already
# produces), and its output lanes are permuted so gate lane p and up lane
# F+p hold the SAME logical element σ(p), where σ is W2's combined [lo; hi]
# k-order — the gated product lands in exactly the order the second matmul's
# lo/hi planes consume. This is GGML_OP_FLASH_FF for the SwiGLU case the
# reference never reached (its flash_ff is GELU-only, Ggml.cs:3478-3500).


def q4_korder_perm(k: int):
    """σ[i] = source element for position i of the COMBINED [lo; hi] 4-bit
    SWAR activation order (nc=1): lo position i ← element 32·(i mod C) +
    2·(i // C); hi position i ← that + 1 (kernels.matmul_q.swar_permute_x)."""
    import numpy as np

    cc = k // 32
    i = np.arange(k // 2)
    lo = 32 * (i % cc) + 2 * (i // cc)
    return np.concatenate([lo, lo + 1])


def mlp_silu_fuse_supported(w1, w2, b: int | None = None) -> bool:
    """w1 = [gate; up] row-concat (2F, E), w2 = down (F_out=E, F) — both
    pre-SWAR Q4_0 QTensors."""
    if not (isinstance(w1, QTensor) and isinstance(w2, QTensor)):
        return False
    if w1.gtype != GType.Q4_0 or w2.gtype != GType.Q4_0:
        return False
    if "qs" not in w1.planes or "qs" not in w2.planes:
        return False
    if len(w1.shape) != 2 or len(w2.shape) != 2:
        return False
    n1, k1 = w1.shape   # (2F, E)
    n2, k2 = w2.shape   # (E, F)
    if n1 != 2 * k2:
        return False
    if k1 % 128 or n1 % 128 or n2 % 128 or k2 % 64:
        return False
    if b is not None and b > _MAX_FUSED_B:
        return False
    # 4-bit transients: wlo + whi + d16, each (k/2, t) f32 → 6·k·t bytes
    return bool(_pick_tile(n1, k1)) and bool(_pick_tile(n2, k2))


def fuse_mlp_silu_q4(w1: QTensor, w2: QTensor) -> dict:
    """Pack [gate; up] (2F, E) + down (E, F) Q4_0 pair into fused planes.
    Gate/up output lanes are permuted by σ = q4_korder_perm(F) so the gated
    product emerges in down's combined lo/hi k-order."""
    from ..quant.formats import swar_pack_values, unpack_nibbles

    n1, k1 = w1.shape
    n2, k2 = w2.shape
    F = k2
    import numpy as np

    sig = q4_korder_perm(F)
    perm = np.concatenate([sig, F + sig])  # gate lanes then up lanes
    vals1 = from_storage_order(
        unpack_nibbles(w1.planes["qs"], k1), 32)[perm]
    vals2 = from_storage_order(unpack_nibbles(w2.planes["qs"], k2), 32)
    return {
        "qs1": swar_pack_values(vals1, 1),
        "d1": swar_pack_scales(w1.planes["d"][perm], 1),
        "qs2": swar_pack_values(vals2, 1),
        "d2": swar_pack_scales(w2.planes["d"], 1),
    }


@functools.partial(jax.jit, static_argnames=("k1", "n1", "n2", "t1", "t2"))
def _call_mlp_fused_silu_q4(xlo, xhi, planes, k1, n1, n2, t1, t2):
    """xlo/xhi: (b, k1/2) f32 in the 4-bit swar k-order (nc=1). n1 = 2F
    gate+up rows; n2 = E output rows. Returns (b, n2) f32."""
    b = xlo.shape[0]
    F = n1 // 2
    g1, g2 = n1 // t1, n2 // t2
    cc1, cc2 = k1 // 32, F // 32

    def kernel(xlo_ref, xhi_ref, qs1_ref, d1_ref, qs2_ref, d2_ref,
               o_ref, hraw_ref, h2_ref):
        mask = jnp.uint32(0x0F0F0F0F)
        from .matmul_q import _decode_f16x2_rows

        j = pl.program_id(0)

        def dot(a, w):
            return jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        def unpack(qs_ref, d_ref):
            p = qs_ref[:]
            vlo = pltpu.bitcast(p & mask, jnp.int8)
            vhi = pltpu.bitcast((p >> jnp.uint32(4)) & mask, jnp.int8)
            d16 = pltpu.repeat(_decode_f16x2_rows(d_ref), 16, axis=0)
            return ((vlo.astype(jnp.float32) - 8.0) * d16,
                    (vhi.astype(jnp.float32) - 8.0) * d16)

        @pl.when(j < g1)
        def _phase1():
            wlo, whi = unpack(qs1_ref, d1_ref)
            hraw_ref[:, pl.dslice(j * t1, t1)] = (
                dot(xlo_ref[:], wlo) + dot(xhi_ref[:], whi))

        @pl.when(j == g1)
        def _combine():
            g = hraw_ref[:, :F]
            u = hraw_ref[:, F:]
            h2_ref[:] = g * (1.0 / (1.0 + jnp.exp(-g))) * u  # silu(g)·u

        @pl.when(j >= g1)
        def _phase2():
            wlo, whi = unpack(qs2_ref, d2_ref)
            o_ref[:] = (dot(h2_ref[:, : F // 2], wlo)
                        + dot(h2_ref[:, F // 2 :], whi))

    p1 = lambda j: (0, jnp.minimum(j, g1 - 1))
    p2 = lambda j: (0, jnp.clip(j - g1, 0, g2 - 1))
    return pl.pallas_call(
        kernel,
        grid=(g1 + g2,),
        in_specs=[
            pl.BlockSpec((b, k1 // 2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k1 // 2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1 // 8, t1), p1, memory_space=pltpu.VMEM),
            pl.BlockSpec((cc1 // 2, t1), p1, memory_space=pltpu.VMEM),
            pl.BlockSpec((F // 8, t2), p2, memory_space=pltpu.VMEM),
            pl.BlockSpec((cc2 // 2, t2), p2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, t2), p2, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, n1), jnp.float32),
                        pltpu.VMEM((b, F), jnp.float32)],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (n1 * k1 + n2 * F),
            bytes_accessed=(n1 * k1 + n2 * F) // 2 + b * (k1 + n2) * 4,
            transcendentals=b * F,
        ),
    )(xlo, xhi, planes["qs1"], planes["d1"], planes["qs2"], planes["d2"])


def flash_ff_silu_q4(fused: dict, x, quantize_acts: bool = True):
    """Apply a fused SwiGLU MLP (fuse_mlp_silu_q4 planes) to x [..., E].
    Gate/up pre-activations and the gated product stay f32 in VMEM."""
    from .matmul_q import swar_permute_x
    from ..ops.matmul import quantize_activations
    from ..quant.quantize import dequantize

    k1 = fused["qs1"].shape[0] * 8
    n1 = fused["qs1"].shape[1]
    n2 = fused["qs2"].shape[1]
    t1, t2 = _pick_tile(n1, k1), _pick_tile(n2, n1 // 2)
    lead = x.shape[:-1]
    x2 = jnp.asarray(x, jnp.float32).reshape(-1, k1)
    if quantize_acts:
        x2 = dequantize(quantize_activations(x2, GType.Q4_0))
    xlo, xhi = swar_permute_x(x2, k1, 1)
    out = _call_mlp_fused_silu_q4(xlo, xhi, fused, k1, n1, n2, t1, t2)
    return out.reshape(*lead, n2)


def flash_ff_q8(fused: dict, x, quantize_acts: bool = True):
    """Apply a fused MLP (fuse_mlp_q8 planes) to x [..., k1]. The input gets
    the same optional Q8 activation round-trip as the unfused path; the
    intermediate h stays f32 in VMEM (strictly more exact than unfused)."""
    from .matmul_q import swar_permute_x_q8
    from ..ops.matmul import quantize_activations
    from ..quant.quantize import dequantize

    k1 = fused["qs1"].shape[0] * 4
    n1 = fused["qs1"].shape[1]
    n2 = fused["b2"].shape[1]
    t1, t2 = _pick_tile(n1, k1), _pick_tile(n2, n1)
    lead = x.shape[:-1]
    x2 = jnp.asarray(x, jnp.float32).reshape(-1, k1)
    if quantize_acts:
        x2 = dequantize(quantize_activations(x2, GType.Q8_0))
    xq = swar_permute_x_q8(x2, k1, 1)
    out = _call_mlp_fused_q8(xq, fused, k1, n1, n2, t1, t2)
    return out.reshape(*lead, n2)
