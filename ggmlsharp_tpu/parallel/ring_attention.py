"""Ring attention: sequence-parallel exact attention over a device mesh.

SURVEY §5 long-context requirement: "ring attention / Ulysses-style sequence
sharding becomes a layer over [blockwise flash]: KV blocks rotated via
ppermute over the ICI ring". Implementation: Q stays sharded over the
sequence axis; K/V shards rotate around the ring with
jax.lax.ppermute; each step folds a blockwise online-softmax partial
(m, l, acc) so the result is EXACT attention over the full sequence with
O(S/n) memory per chip and compute/comm overlap left to XLA's scheduler.

Causality uses global indices: device d owns q rows [d·c, (d+1)·c); at ring
step s it sees the K shard originally owned by device (d - s) mod n.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_partial(q, k, v, scale, qpos0, kpos0, causal):
    """One blockwise partial: returns (m, l, acc) for q against this k/v
    block. q [B,H,Sq,D], k/v [B,H,Sk,D]."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        qidx = qpos0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        kidx = kpos0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(kidx <= qidx, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)  # [B,H,Sq,1]
    p = jnp.exp(s - m)
    p = jnp.where(jnp.isfinite(m), p, 0.0)  # fully-masked rows
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                     preferred_element_type=jnp.float32)
    return m, l, acc


def _combine(m1, l1, a1, m2, l2, a2):
    m = jnp.maximum(m1, m2)
    w1 = jnp.where(jnp.isfinite(m1), jnp.exp(m1 - m), 0.0)
    w2 = jnp.where(jnp.isfinite(m2), jnp.exp(m2 - m), 0.0)
    return m, l1 * w1 + l2 * w2, a1 * w1 + a2 * w2


def _ring_body(q, k, v, axis_name, scale, causal, chunk):
    """shard_map body: local q/k/v chunks [B,H,chunk,D]."""
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    qpos0 = me * chunk

    def step(carry, s):
        k_cur, v_cur, m, l, acc = carry
        src = (me - s) % n  # owner of the current k shard
        kpos0 = src * chunk
        bm, bl, bacc = _block_partial(q, k_cur, v_cur, scale, qpos0, kpos0,
                                      causal)
        m, l, acc = _combine(m, l, acc, bm, bl, bacc)
        # rotate: receive from left neighbor, send to right
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m, l, acc), None

    B, H, Sq, D = q.shape
    m0 = jnp.full((B, H, Sq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Sq, 1), jnp.float32)
    a0 = jnp.zeros((B, H, Sq, D), jnp.float32)
    (k, v, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, a0), jnp.arange(n)
    )
    safe_l = jnp.where(l > 0, l, 1.0)
    return (acc / safe_l).astype(q.dtype)


# --- model integration: sequence-parallel prefill routing -----------------
# set_sequence_mesh installs a mesh+axis; models.common.cached_attention
# then routes long prefills through ring_attention when GGML_TPU_ATTN=ring
# (long-context config: prefill from an EMPTY cache, S sharded over the
# ring). Cleared with set_sequence_mesh(None).
_SP_MESH = (None, "seq")


def set_sequence_mesh(mesh, seq_axis: str = "seq"):
    global _SP_MESH
    _SP_MESH = (mesh, seq_axis)


def sequence_mesh():
    return _SP_MESH


def ring_attention(q, k, v, mesh, seq_axis: str = "model",
                   causal: bool = True, scale: float | None = None):
    """Exact attention with K/V sequence-sharded over `seq_axis`.

    q/k/v: [B, H, S, D] global arrays (S divisible by the axis size).
    Returns [B, H, S, D], sequence-sharded the same way.
    """
    from jax import shard_map

    sc = scale if scale is not None else 1.0 / (q.shape[-1] ** 0.5)
    n = mesh.shape[seq_axis]
    S = q.shape[2]
    assert S % n == 0, (S, n)
    chunk = S // n
    spec = P(None, None, seq_axis, None)

    body = functools.partial(
        _ring_body, axis_name=seq_axis, scale=sc, causal=causal, chunk=chunk
    )
    fn = shard_map(
        lambda q, k, v: body(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
