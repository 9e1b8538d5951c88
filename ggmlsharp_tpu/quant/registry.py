"""Format registry: the quantize_fns table, TPU-native.

Parity with the reference's function-pointer registry (Ggml.cs:219-290,
TypeDefinitions.cs:334-342): per-format {quantize_row, dequantize_row,
fused matmul kernel availability, companion activation dot type}. Unlike the
reference — whose Q4_3 row is empty and whose Q8_1 dequant/vec_dot are null
TODOs (Ggml.cs:248, 278-282) — every registered format here is complete.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..dtypes import GType, TYPE_TRAITS
from .quantize import _DEQUANTIZE, _QUANTIZE


@dataclass(frozen=True)
class FormatEntry:
    quantize_row: Callable
    dequantize_row: Callable
    vec_dot_type: "GType | None"  # activation-side format for fused dots
    has_fused_matmul: bool  # Pallas dequant-matmul kernel available
    has_int_dot: bool  # exact integer-dot decode kernel available


def _entry(g: GType) -> FormatEntry:
    from ..kernels.matmul_q import _DEQUANT_TILE

    return FormatEntry(
        quantize_row=_QUANTIZE[g],
        dequantize_row=_DEQUANTIZE[g],
        vec_dot_type=TYPE_TRAITS[g].vec_dot_type,
        has_fused_matmul=g in _DEQUANT_TILE,
        has_int_dot=g in (GType.Q8_0, GType.Q4_0),
    )


def registry() -> dict:
    """gtype → FormatEntry for every quantized format."""
    return {g: _entry(g) for g in _QUANTIZE}


def get(gtype: GType) -> FormatEntry:
    return _entry(GType(gtype))
