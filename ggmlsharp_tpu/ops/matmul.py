"""Matrix multiply — float and quantized (the inference-critical path).

ggml convention: ``mul_mat(a, b)`` dots rows of ``a`` (weights, shape
[n_out, k] with k = ne[0]) against rows of ``b`` (activations, [..., k]) →
[..., n_out]. Equivalent to ``b @ a.T``. (Reference: ggml_mul_mat builder
Ggml.cs:7137-7152/8222-8246; kernels §2.8.)

Quantized path semantics (mul_mat_q_f32, Ggml.cs:6440-6712): activations are
first quantized row-wise to the weight format's ``vec_dot_type`` (Q8_0/Q8_1/
Q8_K — the INIT-phase trick at Ggml.cs:6641-6655), then the dot runs over
quantized operands. Mathematically the block dot

    Σ_blocks d_w·d_a·Σ_l q_w[l]·q_a[l]   (+ affine m·s corrections)

equals the f32 dot of the two *dequantized* operands, so the reference jnp
path below computes ``dequant(w) @ dequant(quant(act)).T`` — bit-comparable
modulo f32 summation order. The speed path is the fused Pallas kernel in
``ggmlsharp_tpu.kernels`` (weights stay packed in HBM, unpacked in VMEM, MXU
dot in bf16/f32) selected via ``use_pallas=True`` / the global kernel config.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dtypes import GType, TYPE_TRAITS, is_quantized
from ..quant.formats import QTensor
from ..quant.quantize import dequantize, quantize


def mul_mat_f(a, b, precision=None):
    """Float mul_mat: a [*, n_out, k], b [..., k] → [..., n_out].

    f16/bf16 weights hit the MXU natively (the reference instead converts the
    whole src1 to f16 on one thread, Ggml.cs:6361-6379 — on TPU the cast is
    fused into the matmul).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    out_dtype = jnp.promote_types(a.dtype, b.dtype)
    return jnp.matmul(
        b, jnp.swapaxes(a, -1, -2), preferred_element_type=jnp.float32
    ).astype(out_dtype)


def quantize_activations(b, weight_gtype: GType) -> QTensor:
    """The mul_mat_q INIT-phase analog (Ggml.cs:6641-6655): quantize
    activation rows to the weight format's companion dot type."""
    vdt = TYPE_TRAITS[GType(weight_gtype)].vec_dot_type
    return quantize(b, vdt)


def mul_mat_q(a: QTensor, b, quantize_acts: bool = True):
    """Quantized mul_mat, ggml-semantics reference path (unfused jnp).

    a: QTensor weights, logical shape [n_out, k] (blocks along k).
    b: f32 activations [..., k].
    quantize_acts: replicate ggml's activation quantization (needed for
    perplexity parity with llama.cpp); False = weight-only quantization.
    """
    w = dequantize(a)
    if quantize_acts:
        b = dequantize(quantize_activations(b, a.gtype))
    # HIGHEST matches the fused kernel's true-f32 accumulation (ggml parity)
    return jnp.matmul(
        b.astype(jnp.float32),
        jnp.swapaxes(w, -1, -2),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def mul_mat(a, b, quantize_acts: bool = True, use_pallas: bool | None = None):
    """Dispatch on weight type (ggml_compute_forward_mul_mat analog,
    Ggml.cs:6714-6744)."""
    if isinstance(a, QTensor):
        if use_pallas is None:
            from ..kernels.config import pallas_enabled

            use_pallas = pallas_enabled()
        if use_pallas:
            from ..kernels.matmul_q import mul_mat_q_fused

            return mul_mat_q_fused(a, b, quantize_acts=quantize_acts)
        return mul_mat_q(a, b, quantize_acts=quantize_acts)
    return mul_mat_f(a, b)


def out_prod(a, b):
    """Outer product: a [m], b [n] → [n, m]; batched over leading dims.
    (The reference asserts-false on mul_mat's src0 gradient because it lacks
    this op, Ggml.cs:7449-7450 — implemented here so the full matmul VJP
    exists.)"""
    return jnp.einsum("...i,...j->...ji", a, b)
