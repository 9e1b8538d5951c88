"""Shared model building blocks (dense/quantized linear, cached attention).

The reference has no model layer at all (SURVEY §1: "no model layer, no
file/checkpoint format, no CLI"); these are the TPU-native blocks GPT-2 and
Llama are assembled from. Weights may be jnp arrays (f32/bf16/f16) or
QTensor block-quantized planes — `ops.mul_mat` dispatches, and the fused
Pallas dequant-matmul kernel picks up QTensor weights on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import ops
from ..quant.formats import QTensor
from . import kv_cache as kvc


def linear(w, x, b=None, quantize_acts: bool | None = None):
    """y = x·wᵀ (+ b). w: [n_out, k] array or QTensor; x: [..., k].

    quantize_acts defaults to config.quantize_activations (GGML_TPU_QUANT_ACTS,
    True): ggml quantizes activations into the weight format's companion Q8
    type before every quantized matmul (the INIT-phase trick) — required for
    perplexity parity, and what routes b=1 decode onto the exact integer-dot
    kernel. False skips the Q8 round-trip (weight-only quantization)."""
    if isinstance(w, QTensor):
        if quantize_acts is None:
            from ..config import get_config

            quantize_acts = get_config().quantize_activations
        y = ops.mul_mat(w, x, quantize_acts=quantize_acts)
    else:
        y = ops.mul_mat_f(w, x)
    if b is not None:
        y = y + b
    return y


def split_heads(x, n_head):
    """[B, S, H*D] → [B, H, S, D]"""
    B, S, HD = x.shape
    return x.reshape(B, S, n_head, HD // n_head).transpose(0, 2, 1, 3)


def merge_heads(x):
    """[B, H, S, D] → [B, S, H*D]"""
    B, H, S, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * D)


def _attn_impl() -> str:
    """GGML_TPU_ATTN: auto (flash prefill + chunked einsum decode),
    einsum (chunked einsum always), flash (flash always), legacy (round-1
    full-cache materialized-scores path, for A/B)."""
    import os

    return os.environ.get("GGML_TPU_ATTN", "auto")


def _chunk_buckets(T: int, base: int = 256):
    """Prefix-length buckets: geometric from `base` up to T. Attention for a
    live prefix of L tokens only reads/computes the first bucket ≥ L —
    decode cost stops growing with the dead cache tail."""
    out = []
    t = base
    while t < T:
        out.append(t)
        t *= 2
    out.append(T)
    return out


def _einsum_attention(q, k_sl, v_sl, positions, n_rep, softcap):
    """Materialized-scores attention over a [B, Hkv, t, D] prefix slice.
    GQA groups q heads as [B, Hkv, n_rep, S, D] — no repeated K/V copy."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    B, Hq, S, D = q.shape
    t = k_sl.shape[2]
    kpos = jnp.arange(t, dtype=jnp.int32)
    if n_rep > 1:
        qg = q.reshape(B, Hq // n_rep, n_rep, S, D)
        scores = jnp.einsum("bgrsd,bgtd->bgrst", qg, k_sl,
                            preferred_element_type=jnp.float32) * scale
        if softcap:
            scores = jnp.tanh(scores / softcap) * softcap
        mask = kpos[None, None, None, None, :] <= \
            positions[:, None, None, :, None]
        scores = jnp.where(mask, scores, ops.attention.NEG_INF)
        p = jax.nn.softmax(scores, axis=-1).astype(v_sl.dtype)
        out = jnp.einsum("bgrst,bgtd->bgrsd", p, v_sl,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, Hq, S, D)
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k_sl,
                        preferred_element_type=jnp.float32) * scale
    if softcap:
        scores = jnp.tanh(scores / softcap) * softcap
    mask = kpos[None, None, None, :] <= positions[:, None, :, None]
    scores = jnp.where(mask, scores, ops.attention.NEG_INF)
    p = jax.nn.softmax(scores, axis=-1).astype(v_sl.dtype)
    return jnp.einsum("bhst,bhtd->bhsd", p, v_sl,
                      preferred_element_type=jnp.float32)


def cached_attention(q, k_new, v_new, cache, layer, positions,
                     n_rep: int = 1, attn_softcap: float | None = None,
                     prefix_bound: int | None = None):
    """Causal attention against the live KV-cache prefix for one layer.

    q, k_new, v_new: [B, H(q|kv), S, D]; positions: int32 [B, S] absolute
    positions of the S new tokens (contiguous per batch row). Writes k/v
    into the cache, then attends q over cached positions with kpos ≤ qpos.
    Returns ([B, Hq, S, D], cache).

    TPU design (vs the reference's stubbed FLASH_ATTN, Ggml.cs:3454-3476):
      * attention reads only the LIVE cache prefix, not the allocated tail:
        `prefix_bound` (a STATIC bound ≥ all positions+1, chosen host-side
        per length bucket — one executable per bucket, zero in-graph
        control flow) or, when None, an in-graph lax.switch over geometric
        `_chunk_buckets` (for fully-jitted callers like generate_scan);
      * prefill (S > 1) runs the Pallas online-softmax flash kernel
        (kernels.flash) — scores never materialize in HBM;
      * decode (S = 1) uses grouped einsum (scores are tiny; XLA fuses the
        bf16→f32 cast into the pass over the cache);
      * GQA never materializes repeated K/V (grouped einsum / kernel index
        maps).
    """
    cache = kvc.update_layer(cache, layer, k_new, v_new, positions)
    k_all, v_all = kvc.read_layer(cache, layer, compute_dtype=q.dtype)
    impl = _attn_impl()
    softcap = attn_softcap or 0.0
    B, Hq, S, D = q.shape
    T = k_all.shape[2]

    if impl == "legacy":
        if n_rep > 1:
            k_all = jnp.repeat(k_all, n_rep, axis=1)
            v_all = jnp.repeat(v_all, n_rep, axis=1)
        out = _einsum_attention(q, k_all, v_all, positions, 1, softcap)
        return out.astype(q.dtype), cache

    if impl == "ring" and S > 1:
        # sequence-parallel prefill (long-context config): attention over
        # the S new tokens via the ppermute K/V ring, S sharded over the
        # installed sequence mesh. Requires prefill from an EMPTY cache
        # (positions starting at 0) — decode steps (S == 1) fall through
        # to the chunked path below.
        from ..parallel.ring_attention import ring_attention, sequence_mesh

        mesh, seq_axis = sequence_mesh()
        if mesh is not None and S % mesh.shape[seq_axis] == 0:
            kr, vr = k_new, v_new
            if n_rep > 1:
                kr = jnp.repeat(kr, n_rep, axis=1)
                vr = jnp.repeat(vr, n_rep, axis=1)
            out = ring_attention(q, kr, vr, mesh, seq_axis=seq_axis,
                                 causal=True)
            return out.astype(q.dtype), cache

    use_flash = (impl == "flash") or (impl == "auto" and S > 8)

    def attend(t):
        k_sl = jax.lax.slice_in_dim(k_all, 0, t, axis=2)
        v_sl = jax.lax.slice_in_dim(v_all, 0, t, axis=2)
        if use_flash:
            from ..kernels.flash import flash_attention_cached

            npast = positions[:, 0]
            return flash_attention_cached(q, k_sl, v_sl, npast,
                                          softcap=softcap)
        return _einsum_attention(q, k_sl, v_sl, positions, n_rep, softcap)

    if prefix_bound is not None:
        out = attend(min(int(prefix_bound), T))
    else:
        buckets = _chunk_buckets(T)
        if len(buckets) == 1:
            out = attend(T)
        else:
            lim = jnp.max(positions[:, -1]) + 1  # live prefix length bound
            idx = sum((lim > b).astype(jnp.int32) for b in buckets[:-1])
            out = jax.lax.switch(idx,
                                 [lambda t=t: attend(t) for t in buckets])
    return out.astype(q.dtype), cache
