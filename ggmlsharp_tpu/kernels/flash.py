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


def _kernel(*refs, scale, causal, n_past, block_q, block_k, num_k_blocks,
            seq_k, dyn_past, softcap):
    if dyn_past:
        q_ref, k_ref, v_ref, np_ref, o_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
        np_ref = None
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = iq * block_q
    k_start = ik * block_k
    # whole [BH] npast array rides in SMEM (Mosaic rejects 1-sized rank-1
    # blocks); index our row with the grid id
    npast = np_ref[pl.program_id(0)] if dyn_past else n_past

    def body():
        q = q_ref[0].astype(jnp.float32)  # (bq, D)
        k = k_ref[0].astype(jnp.float32)  # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, bk)
        if softcap:
            s = jnp.tanh(s * (1.0 / softcap)) * softcap

        qidx = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kidx = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = kidx < seq_k
        if causal:
            mask = mask & (kidx <= qidx + npast)
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
        @pl.when(k_start <= q_start + block_q - 1 + npast)
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
                     "seq_k_real", "n_rep", "softcap"),
)
def _flash_bhsd(q, k, v, npast_arr, n_past, causal, scale, block_q, block_k,
                seq_k_real, n_rep=1, softcap=0.0):
    """q: [BHq, Sq, D]; k/v: [BHkv, Sk, D] with BHq = BHkv·n_rep (GQA reads
    k/v block b // n_rep — no repeated copy). npast_arr: optional int32
    [BHq] per-row past length (dynamic, continuous batching); when None the
    static n_past applies."""
    BH, sq, d = q.shape
    sk = k.shape[1]
    bq = min(block_q, max(sq, 8))
    bk = min(block_k, sk)
    nq = sq // bq
    nk = sk // bk
    dyn = npast_arr is not None

    grid = (BH, nq, nk)
    kern = functools.partial(
        _kernel, scale=scale, causal=causal, n_past=n_past,
        block_q=bq, block_k=bk, num_k_blocks=nk, seq_k=seq_k_real,
        dyn_past=dyn, softcap=softcap,
    )
    in_specs = [
        pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b // n_rep, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b // n_rep, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if dyn:
        in_specs.append(
            pl.BlockSpec((BH,), lambda b, i, j: (0,),
                         memory_space=pltpu.SMEM)
        )
        args.append(npast_arr)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, sq, d), jnp.float32),
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
            bytes_accessed=BH * sq * d * 8
            + (BH // n_rep) * 2 * sk * d * k.dtype.itemsize,
            transcendentals=BH * sq * sk,
        ),
    )(*args)


def _prep_kv(t):
    """Mosaic has no f16 vector type; bf16/f32 pass through unchanged (cast
    happens per-block in VMEM, so the HBM pass stays at the storage width)."""
    return t.astype(jnp.bfloat16) if t.dtype == jnp.float16 else t


def flash_attention(q, k, v, causal: bool = True, n_past: int = 0,
                    scale: float | None = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K):
    """q [..., Sq, D], k/v [..., Sk, D] → [..., Sq, D] (f32 compute)."""
    sc = scale if scale is not None else 1.0 / (q.shape[-1] ** 0.5)
    lead = q.shape[:-2]
    sq, d = q.shape[-2:]
    sk = k.shape[-2]
    q2 = _prep_kv(q.reshape(-1, sq, d))
    k2 = _prep_kv(k.reshape(-1, sk, d))
    v2 = _prep_kv(v.reshape(-1, sk, d))

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
    out = _flash_bhsd(q2, k2, v2, None, int(n_past), bool(causal), float(sc),
                      int(block_q), int(block_k), sk)
    return out[:, :sq].reshape(*lead, sq, d).astype(q.dtype)


def _cached_ref(q, k, v, npast, scale, softcap):
    """Dense f32 reference of cached causal GQA attention — the backward
    rule for the flash kernel (standard flash-training recompute: cheaper to
    rebuild scores than to store them; pallas_call itself has no VJP)."""
    B, Hq, S, D = q.shape
    Hkv, t = k.shape[1], k.shape[2]
    n_rep = Hq // Hkv
    qg = q.astype(jnp.float32).reshape(B, Hkv, n_rep, S, D)
    s = jnp.einsum("bgrsd,bgtd->bgrst", qg, k.astype(jnp.float32)) * scale
    if softcap:
        s = jnp.tanh(s / softcap) * softcap
    kpos = jnp.arange(t, dtype=jnp.int32)
    qpos = npast[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    mask = kpos[None, None, None, None, :] <= qpos[:, None, None, :, None]
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bgrst,bgtd->bgrsd", p, v.astype(jnp.float32))
    return out.reshape(B, Hq, S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _flash_cached(scale, softcap, block_q, block_k, q, k, v, npast):
    return _flash_cached_impl(scale, softcap, block_q, block_k, q, k, v,
                              npast)


def _flash_cached_fwd(scale, softcap, block_q, block_k, q, k, v, npast):
    out = _flash_cached_impl(scale, softcap, block_q, block_k, q, k, v,
                             npast)
    return out, (q, k, v, npast)


def _flash_cached_bwd(scale, softcap, block_q, block_k, res, g):
    import numpy as np

    q, k, v, npast = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _cached_ref(q_, k_, v_, npast, scale, softcap),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, np.zeros(npast.shape, jax.dtypes.float0)


_flash_cached.defvjp(_flash_cached_fwd, _flash_cached_bwd)


def flash_attention_cached(q, k, v, npast, scale: float | None = None,
                           softcap: float = 0.0,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K):
    """Cached causal attention: q [B, Hq, Sq, D] (new tokens), k/v
    [B, Hkv, T, D] (cache prefix, Hq = Hkv·n_rep), npast int32 [B] — per-
    batch count of already-cached tokens (new token s sits at absolute
    position npast[b]+s; cache rows ≥ npast[b]+Sq are masked out by
    causality). GQA needs no key/value repeat: kernel block index maps Hq
    rows onto their Hkv source. Differentiable: backward recomputes through
    a dense reference (_flash_cached_bwd)."""
    sc = scale if scale is not None else 1.0 / (q.shape[-1] ** 0.5)
    return _flash_cached(float(sc), float(softcap), int(block_q),
                         int(block_k), q, k, v, npast)


def _flash_cached_impl(sc, softcap, block_q, block_k, q, k, v, npast):
    B, hq, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    n_rep = hq // hkv
    q2 = _prep_kv(q.reshape(B * hq, sq, d))
    k2 = _prep_kv(k.reshape(B * hkv, sk, d))
    v2 = _prep_kv(v.reshape(B * hkv, sk, d))
    np_bh = jnp.repeat(npast.astype(jnp.int32), hq)  # [B*Hq] (tiny)

    bq = min(block_q, max(sq, 8))
    bk = min(block_k, sk)
    pq = (-sq) % bq
    pk = (-sk) % bk
    if pq:
        q2 = jnp.pad(q2, ((0, 0), (0, pq), (0, 0)))
    if pk:
        k2 = jnp.pad(k2, ((0, 0), (0, pk), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, pk), (0, 0)))
    out = _flash_bhsd(q2, k2, v2, np_bh, 0, True, float(sc),
                      int(block_q), int(block_k), sk + pk,
                      n_rep=n_rep, softcap=float(softcap))
    return out[:, :sq].reshape(B, hq, sq, d)
