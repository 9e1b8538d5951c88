"""Dtype registry: the ggml type system, TPU-native.

Mirrors the reference's type tables (see /root/reference/GGMLSharp/Ggml.cs:55-217
and TypeDefinitions.cs:153-171): 13 base dtypes — F32, F16, the block-quantized
formats Q4_0/Q4_1/Q4_2/Q4_3/Q5_0/Q5_1/Q8_0/Q8_1 — plus I8/I16/I32; extended here
with BF16 (the TPU-native compute dtype) and the k-quant superblock formats
Q4_K/Q6_K/Q8_K required by BASELINE config 3 (absent from the reference).

Unlike the reference (interleaved C structs of scale+nibbles,
TypeDefinitions.cs:236-290), the TPU-canonical in-memory layout is
structure-of-arrays: packed integer planes (`uint32` lanes holding 8 nibbles or
4 bytes) and separate scale planes, because TPUs have no sub-byte loads and XLA
wants homogeneous arrays. Wire-format (GGUF / ggml block) conversion lives in
`ggmlsharp_tpu.io.gguf`.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass

import jax.numpy as jnp


class GType(enum.IntEnum):
    """ggml_type parity (TypeDefinitions.cs:153-171) + TPU extensions."""

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    Q4_2 = 4
    Q4_3 = 5
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    I8 = 10
    I16 = 11
    I32 = 12
    # TPU-native / k-quant extensions (not in the reference):
    BF16 = 13
    Q4_K = 14
    Q6_K = 15
    Q8_K = 16


@dataclass(frozen=True)
class TypeTraits:
    """Per-type static info (parity with GGML_BLCK_SIZE/GGML_TYPE_SIZE/
    GGML_IS_QUANTIZED tables, Ggml.cs:55-104, 202-217)."""

    name: str
    block_size: int  # elements per quantization block
    type_size_bytes: float  # wire bytes per block (for nbytes parity)
    is_quantized: bool
    # dtype of the activation-side quantization used by the fused dot
    # (quantize_fns vec_dot_type column, Ggml.cs:219-290); None if n/a.
    vec_dot_type: "GType | None" = None
    jnp_dtype: object = None  # for non-quantized types


_F16 = 2
TYPE_TRAITS: dict[GType, TypeTraits] = {
    GType.F32: TypeTraits("f32", 1, 4, False, jnp_dtype=jnp.float32),
    GType.F16: TypeTraits("f16", 1, 2, False, jnp_dtype=jnp.float16),
    GType.BF16: TypeTraits("bf16", 1, 2, False, jnp_dtype=jnp.bfloat16),
    GType.I8: TypeTraits("i8", 1, 1, False, jnp_dtype=jnp.int8),
    GType.I16: TypeTraits("i16", 1, 2, False, jnp_dtype=jnp.int16),
    GType.I32: TypeTraits("i32", 1, 4, False, jnp_dtype=jnp.int32),
    # Legacy 32-block formats. Scale dtypes follow modern ggml/GGUF (f16
    # scales) rather than the reference's May-2023 f32 fields, since the
    # perplexity-parity target is GGUF interop; quantization math is
    # identical (Ggml.cs:334-479 for Q4_0 etc.).
    GType.Q4_0: TypeTraits("q4_0", 32, _F16 + 16, True, GType.Q8_0),
    GType.Q4_1: TypeTraits("q4_1", 32, 2 * _F16 + 16, True, GType.Q8_1),
    GType.Q4_2: TypeTraits("q4_2", 16, _F16 + 8, True, GType.Q8_0),
    GType.Q4_3: TypeTraits("q4_3", 16, 2 * _F16 + 8, True, GType.Q8_1),
    GType.Q5_0: TypeTraits("q5_0", 32, _F16 + 4 + 16, True, GType.Q8_0),
    GType.Q5_1: TypeTraits("q5_1", 32, 2 * _F16 + 4 + 16, True, GType.Q8_1),
    GType.Q8_0: TypeTraits("q8_0", 32, _F16 + 32, True, GType.Q8_0),
    GType.Q8_1: TypeTraits("q8_1", 32, 4 + 4 + 32, True, GType.Q8_1),
    # k-quant superblocks (llama.cpp k_quants; not in the reference).
    GType.Q4_K: TypeTraits("q4_K", 256, 2 * _F16 + 12 + 128, True, GType.Q8_K),
    GType.Q6_K: TypeTraits("q6_K", 256, 128 + 64 + 16 + _F16, True, GType.Q8_K),
    GType.Q8_K: TypeTraits("q8_K", 256, 4 + 256 + 16 * 2, True, GType.Q8_K),
}


def type_name(t: GType) -> str:
    return TYPE_TRAITS[t].name


def block_size(t: GType) -> int:
    return TYPE_TRAITS[t].block_size


def type_size(t: GType) -> float:
    return TYPE_TRAITS[t].type_size_bytes


def is_quantized(t: GType) -> bool:
    return TYPE_TRAITS[t].is_quantized


def row_size_bytes(t: GType, n: int) -> int:
    """Wire bytes for a row of n elements (ggml_nbytes analog, Ggml.cs:3779)."""
    tr = TYPE_TRAITS[t]
    assert n % tr.block_size == 0, (t, n)
    return int(n // tr.block_size * tr.type_size_bytes)
