"""GGML_OP_GET_ROWS — embedding lookup (declared but stubbed in the
reference, Ggml.cs:8689-8694; no builder, no kernel).

Supports float and quantized tables: a quantized table gathers packed block
planes by row and dequantizes only the gathered rows (vocab-sized dequant
would blow HBM for 7B models).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..quant.formats import QTensor
from ..quant.quantize import dequantize


def get_rows(table, ids):
    """table: [vocab, d] array or QTensor; ids: int[...] → [..., d]."""
    ids = jnp.asarray(ids, jnp.int32)
    if isinstance(table, QTensor):
        assert len(table.shape) == 2, table.shape
        planes = {k: jnp.take(v, ids, axis=0) for k, v in table.planes.items()}
        sub = QTensor(table.gtype, (*ids.shape, table.shape[-1]), planes)
        return dequantize(sub)
    return jnp.take(table, ids, axis=0)
