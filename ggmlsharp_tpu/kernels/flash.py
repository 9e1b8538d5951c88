"""Flash attention (online softmax) Pallas kernel.

The reference declares GGML_OP_FLASH_ATTN and budgets its work buffers but
has no kernel, no builder (SURVEY §5 "long-context": Ggml.cs:3454-3476,
8724-8731) — this is the first-class TPU implementation. Blockwise online
softmax: scores never materialize in HBM; running (max, sum, acc) scratch
carries across K-blocks; causal blocks above the diagonal are skipped.

Everything is f32 (this libtpu's Mosaic rejects f16; bf16 inputs are upcast
on entry). Layout: q/k/v flattened to [BH, S, D]; grid (BH, Q-tiles,
K-tiles) with the K axis 'arbitrary' (sequential) so VMEM scratch persists
across K steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import interpret_mode

NEG_INF = -1e30
DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            scale, causal, n_past, block_q, block_k, num_k_blocks, seq_k):
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = iq * block_q
    k_start = ik * block_k

    def body():
        q = q_ref[0].astype(jnp.float32)  # (bq, D)
        k = k_ref[0].astype(jnp.float32)  # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, bk)

        qidx = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kidx = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = kidx < seq_k
        if causal:
            mask = mask & (kidx <= qidx + n_past)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]  # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        # explicit mask: when an entire row is masked m_new stays -1e30 and
        # exp(s - m_new) would be exp(0)=1 on masked lanes
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)  # (bq, bk)
        l_new = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new
        l_scr[:] = l_new

    if causal:
        # skip blocks entirely above the causal diagonal
        @pl.when(k_start <= q_start + block_q - 1 + n_past)
        def _():
            body()
    else:
        body()

    @pl.when(ik == num_k_blocks - 1)
    def _finish():
        l = l_scr[:]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_past", "causal", "scale", "block_q", "block_k",
                     "seq_k_real"),
)
def _flash_bhsd(q, k, v, n_past, causal, scale, block_q, block_k, seq_k_real):
    BH, sq, d = q.shape
    sk = k.shape[1]
    bq = min(block_q, max(sq, 8))
    bk = min(block_k, sk)
    nq = sq // bq
    nk = sk // bk

    grid = (BH, nq, nk)
    kern = functools.partial(
        _kernel, scale=scale, causal=causal, n_past=n_past,
        block_q=bq, block_k=bk, num_k_blocks=nk, seq_k=seq_k_real,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * sq * sk * d,
            bytes_accessed=4 * BH * (sq * d * 2 + 2 * sk * d),
            transcendentals=BH * sq * sk,
        ),
    )(q, k, v)


def flash_attention(q, k, v, causal: bool = True, n_past: int = 0,
                    scale: float | None = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K):
    """q [..., Sq, D], k/v [..., Sk, D] → [..., Sq, D] (f32 compute)."""
    sc = scale if scale is not None else 1.0 / (q.shape[-1] ** 0.5)
    lead = q.shape[:-2]
    sq, d = q.shape[-2:]
    sk = k.shape[-2]
    q2 = q.reshape(-1, sq, d).astype(jnp.float32)
    k2 = k.reshape(-1, sk, d).astype(jnp.float32)
    v2 = v.reshape(-1, sk, d).astype(jnp.float32)

    # pad to block multiples ourselves (zero-padded K rows are masked via
    # seq_k; relying on pallas block padding leaves NaNs in interpret mode)
    bq = min(block_q, max(sq, 8))
    bk = min(block_k, sk)
    pq = (-sq) % bq
    pk = (-sk) % bk
    if pq:
        q2 = jnp.pad(q2, ((0, 0), (0, pq), (0, 0)))
    if pk:
        k2 = jnp.pad(k2, ((0, 0), (0, pk), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, pk), (0, 0)))
    out = _flash_bhsd(q2, k2, v2, int(n_past), bool(causal), float(sc),
                      int(block_q), int(block_k), sk)
    return out[:, :sq].reshape(*lead, sq, d).astype(q.dtype)
