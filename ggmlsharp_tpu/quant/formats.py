"""Block-quantized tensor containers (TPU-canonical layout).

The reference stores quantization blocks as interleaved C structs
(`block_q4_0{float d; u8 qs[16]}` etc., TypeDefinitions.cs:236-290). On TPU we
store structure-of-arrays planes instead:

  * ``qs`` — packed integer payload. 4-bit formats pack 8 nibbles per
    ``uint32`` lane (element ``e`` of a row lives in word ``e // 8``, bits
    ``4 * (e % 8)``); 8-bit formats keep plain ``int8``. TPUs have no sub-byte
    loads, and XLA/Pallas unpack uint32 lanes with shifts at full VPU rate.
  * ``d`` / ``m`` / ``qh`` / ... — per-block scale/min/high-bit planes.

All planes share leading dims with the logical tensor; blocks run along the
last axis. A ``QTensor`` is a registered pytree so it flows through jit/vmap/
shard_map; ``gtype`` and logical ``shape`` are static (aux) data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dtypes import GType, TYPE_TRAITS, block_size


class QTensor:
    """A block-quantized tensor: static (gtype, shape) + array planes."""

    __slots__ = ("gtype", "shape", "planes")

    def __init__(self, gtype: GType, shape: tuple, planes: dict):
        self.gtype = GType(gtype)
        self.shape = tuple(shape)
        self.planes = dict(planes)

    # --- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (self.gtype, self.shape, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        gtype, shape, keys = aux
        return cls(gtype, shape, dict(zip(keys, children)))

    # --- convenience -----------------------------------------------------
    def __getitem__(self, k):
        return self.planes[k]

    @property
    def ndim(self):
        return len(self.shape)

    def nbytes_wire(self) -> int:
        """ggml_nbytes parity: wire bytes of the equivalent ggml blocks."""
        from ..dtypes import row_size_bytes

        n = 1
        for s in self.shape:
            n *= s
        per_row = row_size_bytes(self.gtype, self.shape[-1])
        return per_row * (n // self.shape[-1])

    def __repr__(self):
        pl = {k: (tuple(v.shape), str(v.dtype)) for k, v in self.planes.items()}
        return f"QTensor({TYPE_TRAITS[self.gtype].name}, shape={self.shape}, planes={pl})"


jax.tree_util.register_pytree_node_class(QTensor)


# --- nibble packing ------------------------------------------------------

def pack_nibbles(vals: jnp.ndarray) -> jnp.ndarray:
    """Pack uint4 values (int32/uint8 in [0,15], last axis multiple of 8)
    into uint32 lanes: out[..., w] holds elements 8w..8w+7, element j in
    bits 4j."""
    *lead, n = vals.shape
    assert n % 8 == 0, n
    v = vals.astype(jnp.uint32).reshape(*lead, n // 8, 8)
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4).reshape((1,) * (len(lead) + 1) + (8,))
    return _or_reduce(v << shifts)


def _or_reduce(x):
    out = x[..., 0]
    for j in range(1, x.shape[-1]):
        out = out | x[..., j]
    return out


def unpack_nibbles(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse of pack_nibbles → int32 values in [0,15], shape (..., n)."""
    *lead, nw = packed.shape
    assert nw * 8 == n, (nw, n)
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4).reshape((1,) * (len(lead) + 1) + (8,))
    vals = (packed[..., None] >> shifts) & jnp.uint32(0xF)
    return vals.reshape(*lead, n).astype(jnp.int32)


def pack_bytes_u32(vals: jnp.ndarray) -> jnp.ndarray:
    """Pack uint8 values (last axis multiple of 4) into uint32 lanes."""
    *lead, n = vals.shape
    assert n % 4 == 0
    v = vals.astype(jnp.uint32).reshape(*lead, n // 4, 4)
    shifts = (jnp.arange(4, dtype=jnp.uint32) * 8).reshape((1,) * (len(lead) + 1) + (4,))
    return _or_reduce(v << shifts)


def unpack_bytes_u32(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    *lead, nw = packed.shape
    assert nw * 4 == n
    shifts = (jnp.arange(4, dtype=jnp.uint32) * 8).reshape((1,) * (len(lead) + 1) + (4,))
    vals = (packed[..., None] >> shifts) & jnp.uint32(0xFF)
    return vals.reshape(*lead, n).astype(jnp.int32)


def check_last_axis(x: jnp.ndarray, gtype: GType):
    bs = block_size(gtype)
    if x.shape[-1] % bs != 0:
        raise ValueError(
            f"last axis {x.shape[-1]} not a multiple of {TYPE_TRAITS[gtype].name} "
            f"block size {bs}"
        )
