"""Engineered comm/compute overlap for the TP-sharded dequant-matmul
(BASELINE north-star: "all-gather/reduce-scatter collectives overlapped with
the fused dequant-matmul compute"; VERDICT r1 item 7).

Row-parallel matmul (weights K-sharded over `model`) needs a cross-device
reduction of partial outputs. The naive form — full local matmul, then one
psum — serializes ALL compute before ALL communication. This module
decomposes the local matmul into D output-row tiles and runs a ring
reduce-scatter where each ppermute hop is in flight WHILE the next tile's
dequant-matmul executes:

    acc = C(t_0)                       # this device's first tile
    for s in 0..D-2:
        recv = ppermute(acc)           # comm step s  ┐ overlap: XLA's async
        nxt  = C(t_{s+1})              # compute s+1  ┘ collectives + LHS
        acc  = recv + nxt

On TPU the XLA latency-hiding scheduler turns each ppermute into a
collective-permute-{start,done} pair and hoists the next tile's compute
between them (asserted on AOT-compiled v5e HLO in
tests/test_overlap.py); each hop rides ICI while the MXU/VPU stay busy.
The reference has no distribution at all (SURVEY §2.11).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import ops
from ..quant.formats import QTensor


def _slice_rows(qt, start, size):
    """Logical row slice of a 2-D QTensor (all planes share the leading
    row axis, so one dynamic_slice per plane; traced `start` ok)."""
    if not isinstance(qt, QTensor):
        return jax.lax.dynamic_slice_in_dim(qt, start, size, axis=0)
    planes = {
        k: jax.lax.dynamic_slice_in_dim(v, start, size, axis=0)
        for k, v in qt.planes.items()
    }
    return QTensor(qt.gtype, (size, qt.shape[1]), planes)


def ring_reduce_scatter_mul_mat(qt_local, x_local, axis: str, n_devices: int,
                                use_pallas: bool | None = None):
    """Inside shard_map: row-parallel quantized matmul with the reduce-
    scatter ring overlapped against per-tile compute.

    qt_local: this device's K-shard of the weights, logical [N, K/D]
    (QTensor planes or dense). x_local: [..., K/D]. Returns this device's
    finished output tile [..., N/D] plus its logical tile index
    ((axis_index+1) mod D — the ring's natural landing order).
    """
    D = n_devices
    idx = jax.lax.axis_index(axis)
    n = qt_local.shape[0]
    ntile = n // D

    def C(j):
        sub = _slice_rows(qt_local, j * ntile, ntile)
        return ops.mul_mat(sub, x_local, quantize_acts=False,
                           use_pallas=use_pallas)

    perm = [(d, (d + 1) % D) for d in range(D)]
    acc = C(idx % D)
    for s in range(D - 1):
        recv = jax.lax.ppermute(acc, axis, perm)  # comm in flight ...
        nxt = C((idx - 1 - s) % D)                # ... while this runs
        acc = recv + nxt
    return acc, (idx + 1) % D


def row_parallel_mul_mat_overlapped(qt, x, mesh, axis: str = "model",
                                    use_pallas: bool | None = None):
    """Full-array wrapper: weights sharded [N, K/D] (P(None, axis)), x
    sharded on its last dim, returns the REPLICATED [..., N] result
    (reduce-scatter ring + all-gather of finished tiles — the all-gather
    hops also overlap the final tile adds under the LHS scheduler)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    D = mesh.shape[axis]

    def body(qt_l, x_l):
        if isinstance(qt_l, QTensor):
            # shard_map keeps the pytree's STATIC logical shape while the
            # plane arrays arrive K-sharded — rebind the local shape
            qt_l = QTensor(qt_l.gtype, (qt_l.shape[0], x_l.shape[-1]),
                           qt_l.planes)
        acc, _ = ring_reduce_scatter_mul_mat(qt_l, x_l, axis, D,
                                             use_pallas=use_pallas)
        y = jax.lax.all_gather(acc, axis, axis=0, tiled=False)
        # device d finishes tile (d+1)%D → gathered device-order is
        # [t1, t2, ..., t0]; roll one tile to natural order
        y = jnp.roll(y, 1, axis=0)
        return jnp.moveaxis(y, 0, -2).reshape(*y.shape[1:-1], -1)

    if isinstance(qt, QTensor):
        from ..quant.formats import repack_k_chunks

        # per-chunk-planar repack: makes last-axis plane slicing a true
        # logical K-slice (bit-identical; see formats.repack_k_chunks)
        qt = repack_k_chunks(qt, D)
        w_specs = QTensor(qt.gtype, qt.shape,
                          {k: P(None, axis) for k in qt.planes})
    else:
        w_specs = P(None, axis)
    return shard_map(
        body, mesh=mesh,
        in_specs=(w_specs, P(*([None] * (x.ndim - 1) + [axis]))),
        out_specs=P(),
        check_vma=False,  # replication via all_gather, not inferable
    )(qt, x)
